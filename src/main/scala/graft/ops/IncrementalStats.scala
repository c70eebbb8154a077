package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Running corpus statistics across ingest batches — the monitoring
  * companion of [[IncrementalDedup]]: after every accepted batch the
  * pipeline wants "how big is the corpus now, per language" without ever
  * rescanning it.
  *
  * Additive state is replay-HOSTILE (a batch re-applied after a crash
  * double-counts — unlike keyed upserts, addition isn't idempotent), so
  * exactly-once is made structural: the per-language stat rows AND an
  * `applied` marker row for the batch id commit in ONE
  * [[StateTable.upsert]] — one atomic version swap. A replayed batch
  * sees its marker and returns the current stats unchanged; a crash
  * before the commit leaves neither the stats nor the marker, and the
  * rerun applies cleanly. There is no order-of-commits window at all.
  *
  * Scale shape: the batch collapses to per-language aggregates
  * (partial-aggregated, O(langs) rows) before any state is touched; the
  * merge joins those few rows against the current O(langs) stat rows.
  * Marker rows accrue one per applied batch — bounded by batch count,
  * negligible next to any corpus.
  */
object IncrementalStats {

  private val statKind = "stat"
  private val appliedKind = "applied"

  /** Apply one batch (exactly once, by `batchId`) and return the updated
    * per-language stats. */
  def update(spark: SparkSession, stateRoot: String, batch: DataFrame,
      batchId: Long): DataFrame = {
    import spark.implicits._
    val cur = StateTable.read(spark, stateRoot)
    val alreadyApplied = cur.exists(_.filter(col("kind") === appliedKind &&
      col("key") === batchId.toString).limit(1).count() > 0)
    if (alreadyApplied) return stats(spark, stateRoot)
    val bAgg = batch
      .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("nt"),
        length(col("text")).cast("long").as("nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nt").cast("long").as("n_tokens"),
        sum("nc").as("n_chars"))
      .select(lit(statKind).as("kind"), col("lang").as("key"),
        col("n_docs"), col("n_tokens"), col("n_chars"))
    val merged = cur match {
      case None => bAgg
      case Some(st) => st.filter(col("kind") === statKind)
        .unionByName(bAgg)
        .groupBy("kind", "key")
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
          sum("n_chars").as("n_chars"))
    }
    val marker = Seq((appliedKind, batchId.toString, 0L, 0L, 0L))
      .toDF("kind", "key", "n_docs", "n_tokens", "n_chars")
    // one upsert = one atomic version: stats and marker land together
    StateTable.upsert(spark, stateRoot,
      merged.unionByName(marker).localCheckpoint(), Seq("kind", "key"))
    stats(spark, stateRoot)
  }

  /** Current per-language stats: (lang, n_docs, n_tokens, n_chars). */
  def stats(spark: SparkSession, stateRoot: String): DataFrame =
    StateTable.read(spark, stateRoot) match {
      case None => spark.emptyDataFrame
      case Some(st) => st.filter(col("kind") === statKind)
        .select(col("key").as("lang"), col("n_docs"), col("n_tokens"),
          col("n_chars"))
    }
}
