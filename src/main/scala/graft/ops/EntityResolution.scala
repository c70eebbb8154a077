package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution) — the record-level
  * sibling of the document dedup family: find pairs of records that
  * are *almost* the same entity.
  *
  * Scale design mirrors MinHash-LSH candidate generation
  * ([[Dedup.minhashCandidates]]): candidates come from a self-EQUI-join
  * on a blocking key — never an all-pairs cartesian — so the shuffle
  * clusters on the block and the quadratic cost is bounded per block.
  * The edit-distance check runs only inside blocks; `maxBlock` drops
  * pathologically hot blocks (the blocking analog of the LSH
  * hot-bucket cap) so one degenerate key can't go quadratic at 100 TB —
  * callers split hot blocks with a finer key instead.
  */
object EntityResolution {

  /** Candidate pairs (id_a < id_b) within a block whose `nameCol` edit
    * distance is ≤ `maxDistance`. Output: id_a, id_b, distance. */
  def blockedPairs(records: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDistance: Int,
      maxBlock: Option[Int] = None): DataFrame = {
    val base = records.select(
      (Seq(col(idCol).as("__er_id"), col(nameCol).as("__er_name")) ++
        blockCols.map(col)): _*)
    val blocked = maxBlock match {
      case Some(cap) =>
        // hot-block cap as a WINDOW count, not an aggregate + join-back:
        // the window clusters on the block columns — the exact
        // partitioning the self-join below needs — so the cap costs the
        // one exchange the join was paying anyway
        base.withColumn("__er_n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(blockCols.map(col): _*)))
          .filter(col("__er_n") <= cap)
          .drop("__er_n")
      case None => base
    }
    // Spread the PROBE side (r18): locally the records scan is one
    // unsplittable row group, the planner broadcasts the build side, and
    // the whole per-pair distance loop then runs in that single scan
    // task — 1.5 s serial at sf0.1 where 32 slots sat idle. No-op at
    // scale (the gate only fires when the scan arrives narrower than
    // half the slots; a big records table plans a shuffle join anyway).
    val a = Spread.wide(blocked, Some(hash(blockCols.map(col): _*)))
      .withColumnRenamed("__er_id", "id_a")
      .withColumnRenamed("__er_name", "name_a")
    val b = blocked.withColumnRenamed("__er_id", "id_b")
      .withColumnRenamed("__er_name", "name_b")
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      // [[graft.functions.LevenshteinBanded]]: same -1-above-threshold
      // semantics as the builtin 3-arg levenshtein, but the ASCII band
      // runs on raw bytes (~3× cheaper per pair — the distance pass, not
      // the candidate join, dominates this op). Its first check is the
      // |len(a) − len(b)| > maxDistance early-exit, so a separate
      // length-guard filter is pure duplicate work (measured: the guard
      // pruned 3% of in-block pairs on TPC-H part names and slowed the
      // stage)
      .withColumn("distance",
        graft.functions.LevenshteinBanded(
          col("name_a"), col("name_b"), maxDistance))
      .filter(col("distance") >= 0 && col("distance") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("distance"))
  }
}
