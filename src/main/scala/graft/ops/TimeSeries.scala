package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key time-series features over event streams.
  *
  * EWMA is inherently sequential (each step depends on the previous), so
  * it cannot partial-aggregate; the scale shape is the same as
  * [[Sampling.packByBudget]]'s: one shuffle clustering on the key, then
  * an ordered fold per key. State per key is its event list — bounded by
  * per-key cardinality, not corpus size; at 100 TB the fold runs where
  * the key's rows land, never on the driver.
  *
  * The fold is seeded with the FIRST observation (s₁ = x₁,
  * sₙ = α·xₙ + (1−α)·sₙ₋₁) and folds in (ts, tiebreak) order, which is
  * exactly a left fold over the ordered value list — reproducible
  * bit-for-bit in any engine with the same lambda.
  */
object TimeSeries {

  /** Ordered per-key value list: collect → sort by (ts, tiebreak). */
  private def orderedValues(tsCol: String, tieBreak: String,
      valueCol: String): Column =
    transform(
      array_sort(collect_list(struct(col(tsCol), col(tieBreak), col(valueCol)))),
      e => e.getField(valueCol))

  /** Exponentially-weighted moving average per key; one row per key with
    * the final smoothed value and the observation count. */
  def ewma(df: DataFrame, key: String, tsCol: String, tieBreak: String,
      valueCol: String, alpha: Double): DataFrame = {
    val vals = orderedValues(tsCol, tieBreak, valueCol)
    df.groupBy(key).agg(
      count(lit(1)).as("n_events"),
      round(
        aggregate(
          // fold the tail with the head as the seed (s₁ = x₁); length
          // size(vals) safely over-covers (start+MaxValue overflows)
          slice(vals, lit(2), size(vals)),
          element_at(vals, 1),
          (acc, x) => lit(alpha) * x + lit(1 - alpha) * acc),
        4).as("ewma"))
  }
}
