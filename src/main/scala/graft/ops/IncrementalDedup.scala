package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous-ingest exact dedup: each batch is checked against the
  * corpus-so-far and the survivor hashes are committed back — the
  * operational loop a training-data pipeline runs every ingest cycle.
  *
  *   1. [[Dedup.bloomPrefilter]] against the current hash state: rows the
  *      bloom rejects skip the verification join entirely (at a steady
  *      state most of every batch is novel, so most rows never shuffle).
  *   2. Exact split: known rows are dropped, in-batch duplicates collapse
  *      to their lowest doc_id.
  *   3. New hashes are [[StateTable.upsert]]ed — versioned, atomic,
  *      crash-safe; a failed run leaves the previous corpus state intact
  *      and the batch simply reruns.
  *
  * State grows by one row per unique document ever seen (hash + keeper
  * id), partitioned by the state table's key shuffle — the corpus text
  * itself is never re-read.
  */
object IncrementalDedup {

  /** Process one batch. Returns (accepted rows, committed version).
    * Accepted = first-seen content, lowest doc_id wins within the batch. */
  def ingest(spark: SparkSession, stateRoot: String, batch: DataFrame,
      expectedCorpus: Long = 1000000L): (DataFrame, Long) = {
    val known = StateTable.read(spark, stateRoot) match {
      case None => batch.withColumn("is_known", lit(false))
      case Some(state) =>
        // bloom over the compact state hashes, then exact verify
        Dedup.bloomPrefilterHashes(batch, state.select("h"), expectedCorpus)
    }
    // materialize ONCE before committing: the caller must see exactly the
    // rows whose hashes were written, not a lazy plan that re-reads the
    // batch source after the commit
    val hashed = known.filter(!col("is_known"))
      .withColumn("h", md5(trim(lower(col("text")))))
    // null text hashes to null: those rows carry no content to be a
    // duplicate OF, so each passes through as its own keeper instead of
    // all collapsing into one shared null-key window partition — and no
    // null hash is ever committed to the state table
    val deduped = hashed.filter(col("h").isNotNull)
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
    val fresh = deduped.unionByName(hashed.filter(col("h").isNull))
      .drop("is_known")
      .localCheckpoint()
    val version = StateTable.upsert(spark, stateRoot,
      fresh.filter(col("h").isNotNull)
        .select(col("h"), col("doc_id").as("keeper_id")), Seq("h"))
    (fresh.drop("h"), version)
  }
}
