package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change detection + publish decision.
  *
  * Reference semantics:
  *  - `_compute_unchanged` (`polla_app/pipeline.py:257-285`): a run is
  *    "unchanged" iff the previous state holds a record with the same
  *    (sorteo, fecha) — Python `None == None` is true, so the key equality
  *    is null-safe — and either the provenance sha256 matches (cheap
  *    short-circuit, PROV-01) or the amounts map is deeply equal.
  *  - decision rule (`pipeline.py:439-459`): skip if unchanged; quarantine
  *    if mismatch_ratio > threshold (default 0.25) or max_deviation > 0.10;
  *    else publish; force_publish turns a skip into publish_forced.
  *
  * Spark-first: state is deduplicated to one row per (sorteo, fecha) —
  * encoding the reference's first-match-wins `break` without scan-order
  * dependence — then LEFT-joined with null-safe `<=>`. Map equality is
  * key-order-insensitive (`array_sort(map_entries(...))`) because Spark
  * maps, unlike Python dicts, carry no defined order.
  */
object StatePipeline {

  private def canonMap(c: String) = array_sort(map_entries(col(c)))

  /** Left-join current records against previous state; adds `unchanged`.
    *
    * Both sides need: sorteo LONG, fecha STRING/DATE, sha256 STRING,
    * pozos_proximo MAP<STRING,LONG>.
    */
  def withUnchanged(current: DataFrame, state: DataFrame): DataFrame = {
    val prev = state
      .select(col("sorteo").as("p_sorteo"), col("fecha").as("p_fecha"),
        col("sha256").as("p_sha256"), col("pozos_proximo").as("p_pozos"))
      .dropDuplicates("p_sorteo", "p_fecha") // first-match-wins, order-free

    current
      .join(prev,
        col("sorteo") <=> col("p_sorteo") && col("fecha") <=> col("p_fecha"),
        "left")
      .withColumn("unchanged",
        coalesce(
          (col("sha256").isNotNull && col("p_sha256").isNotNull &&
            col("sha256") === col("p_sha256")) ||
          (array_sort(map_entries(col("pozos_proximo"))) <=>
            array_sort(map_entries(col("p_pozos")))),
          lit(false)))
      .drop("p_sorteo", "p_fecha", "p_sha256", "p_pozos")
  }

  /** Change detection against a versioned [[StateTable]] — the large-key-
    * space form: read latest snapshot, null-safe join, then upsert the new
    * records as the next version (state written unconditionally, like the
    * reference's `pipeline.py:436-437`). Returns the flagged frame. */
  def withUnchangedAgainstTable(spark: org.apache.spark.sql.SparkSession,
      current: DataFrame, stateRoot: String): DataFrame = {
    val flagged = StateTable.read(spark, stateRoot) match {
      case Some(state) => withUnchanged(current, state)
      case None => current.withColumn("unchanged", lit(false))
    }
    StateTable.upsert(spark, stateRoot,
      current.select("sorteo", "fecha", "sha256", "pozos_proximo"),
      Seq("sorteo", "fecha"))
    flagged
  }

  /** Publish decision as pure values (driver-side gate around sinks). */
  def decide(
      unchanged: Boolean,
      mismatchRatio: Double,
      maxDeviation: Double,
      mismatchThreshold: Double = 0.25,
      forcePublish: Boolean = false): (String, Boolean, String) = {
    val (status, publish, reason) =
      if (unchanged)
        ("skip", false, "sorteo_fecha_and_amounts_unchanged")
      else if (mismatchRatio > mismatchThreshold || maxDeviation > 0.10) {
        val why =
          if (maxDeviation > 0.10) f"max_deviation_${maxDeviation}%.2f_exceeds_threshold_0.10"
          else f"mismatch_ratio_${mismatchRatio}%.2f_exceeds_threshold_$mismatchThreshold%s"
        ("quarantine", false, why)
      } else ("publish", true, "updated_or_new_amounts")
    if (forcePublish && unchanged) ("publish_forced", true, "force_publish_requested")
    else (status, publish, reason)
  }

  /** Column form of the decision rule, for set-at-a-time pipelines. */
  def decideCols(df: DataFrame, mismatchThreshold: Double = 0.25,
      forcePublish: Boolean = false): DataFrame =
    df.withColumn("decision_status",
        when(col("unchanged") && lit(forcePublish), "publish_forced")
          .when(col("unchanged"), "skip")
          .when(col("mismatch_ratio") > mismatchThreshold ||
                col("max_deviation") > 0.10, "quarantine")
          .otherwise("publish"))
      .withColumn("publish",
        col("decision_status").isin("publish", "publish_forced"))
}
