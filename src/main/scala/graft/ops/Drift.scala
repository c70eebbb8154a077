package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a reference dataset and a
  * current batch — the check a production ingest runs before letting a
  * new crawl/snapshot into the training mix (upstream format changes,
  * collapsed fields, and source outages all show up as drift long before
  * they show up as model regressions).
  *
  * PSI (population stability index) over FIXED-WIDTH bins on a declared
  * [lo, hi) range: bin edges are a pure function of the arguments, never
  * of the data (data-dependent quantile edges make the metric
  * incomparable across runs and engines). Conventional reading:
  * < 0.1 stable, 0.1–0.25 moderate drift, > 0.25 investigate.
  *
  * Scale shape: bin assignment is one map-side expression on each scan;
  * each side partial-aggregates to `bins` rows before its shuffle; the
  * spine join and PSI arithmetic touch `bins` rows. Two scans, O(bins)
  * shuffled — nothing about the corpus size reaches the wire.
  */
object Drift {

  /** Clamped fixed-width bin index in [0, bins). */
  def binOf(x: Column, lo: Double, hi: Double, bins: Int): Column =
    least(lit(bins - 1L), greatest(lit(0L),
      floor((x.cast("double") - lo) / (hi - lo) * bins))).cast("long")

  /** Per-bin PSI detail: counts, eps-smoothed proportions, and each
    * bin's contribution, plus the total `psi` replicated on every row
    * (sum of ROUNDED contributions, so the published per-bin report
    * reproduces the headline number exactly). Empty bins are present
    * with zero counts — the report's shape never depends on the data. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int = 10,
      eps: Double = 1e-6): DataFrame = {
    def hist(df: DataFrame, n: String) =
      df.select(binOf(col(valueCol), lo, hi, bins).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(n))
    val spine = ref.sparkSession.range(bins).select(col("id").as("bin"))
    val joined = spine
      .join(hist(ref, "n_ref"), Seq("bin"), "left")
      .join(hist(cur, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    val withP = joined.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        greatest(col("n_ref") / col("t_ref").cast("double"), lit(eps)).as("p_ref"),
        greatest(col("n_cur") / col("t_cur").cast("double"), lit(eps)).as("p_cur"))
      .withColumn("contrib",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6))
    withP
      .withColumn("psi", sum("contrib").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
        col("contrib"), round(col("psi"), 6).as("psi"))
  }
}
