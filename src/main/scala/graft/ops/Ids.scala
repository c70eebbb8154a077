package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable, contiguous id assignment — the "number every document in the
  * corpus" step before sharded training export.
  *
  * The naive Spark answer, `row_number()` over a global `Window.orderBy`,
  * moves the entire dataset through ONE partition (the WindowExec
  * warning); `monotonically_increasing_id` is partition-dependent and
  * non-contiguous. This is the classic two-phase form instead: total-sort
  * by the key (range exchange — distributed), count rows per partition
  * (one cheap job over the sorted frame), cumulative-sum those counts on
  * the driver (one long per partition), and add each partition's offset
  * in a map-only pass. Ids depend only on the total ORDER, not on where
  * the range boundaries fall, so the assignment is deterministic under
  * any partition count — `sortCols` must therefore be a total order
  * (include a tiebreaking unique column).
  */
object Ids {

  /** Append `idCol` = 0-based contiguous rank of the row under
    * `sortCols` (ascending). `numPartitions` pins the range-exchange
    * width (AQE otherwise coalesces small inputs — fine for ids, but
    * callers sizing downstream work may want the explicit knob). */
  def stableIds(df: DataFrame, sortCols: Seq[String],
      idCol: String = "stable_id",
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, sortCols.map(col): _*)
      case None => df.repartitionByRange(sortCols.map(col): _*)
    }
    // counting + numbering must see ONE materialization; reliable via the
    // graft.checkpoint.dir conf ([[Materialize]]) — the numbering pass
    // re-reads these blocks, so on a cluster they must survive executors
    val sorted = Materialize(ranged.sortWithinPartitions(sortCols.map(col): _*))
    val counts = sorted.rdd
      .mapPartitionsWithIndex((pid, it) => Iterator.single(pid -> it.size))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(pid) = rows before pid
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val numbered = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ i); i += 1; out }
    }
    spark.createDataFrame(numbered, schema)
  }

  /** Append `rnCol` = 1-based rank of the row within its `keyCols` group
    * under `orderCols`, and `nCol` = the group size — the (rn, n) pair
    * every SQL ranking function is a closed form of when `orderCols` is
    * a TOTAL order within the key (include a unique tiebreaker): rank =
    * dense_rank = row_number = rn, percent_rank = (rn−1)/(n−1),
    * cume_dist = rn/n, ntile from (rn, n) integer arithmetic.
    *
    * This replaces `Window.partitionBy(key)` for the FEW-KEYS regime:
    * a partition-per-key window caps parallelism at the distinct-key
    * count and single-threads each key's sort (q36 measured 13.9 s =
    * 10.2× oracle at sf10 over `event_type`'s handful of keys — r17
    * VERDICT item 4). Here the sort is a range exchange over
    * (key, order) — parallelism = partition count regardless of key
    * count — followed by one tiny per-key aggregate, broadcast back,
    * and a map-only rank arithmetic pass. The per-key frame must be
    * broadcast-sized (key cardinality ≪ data); for HIGH-cardinality
    * keys use the plain window — with many keys its parallelism is
    * already fine. */
  def groupRanks(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      rnCol: String = "__rn", nCol: String = "__n"): DataFrame = {
    val ids = stableIds(df, keyCols ++ orderCols, "__gid")
    // per-key offset = the key's smallest global id; group size rides
    // along — one codegen agg over the numbered frame, O(keys) rows
    val perKey = ids.groupBy(keyCols.map(col): _*)
      .agg(min(col("__gid")).as("__koff"), count(lit(1)).as(nCol))
    ids.join(broadcast(perKey), keyCols)
      .withColumn(rnCol, col("__gid") - col("__koff") + 1)
      .drop("__gid", "__koff")
  }
}
