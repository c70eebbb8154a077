package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture materialization: compact a change stream into
  * slowly-changing-dimension type-2 (SCD2) version intervals.
  *
  * This generalizes the reference's change-detection step (state short-
  * circuit on sha/amounts, `pipeline.py:264-285`): instead of keeping
  * only the latest state per key, keep every distinct run of values as a
  * [valid_from, valid_to) interval with an is_current marker — the shape
  * a warehouse dimension table wants.
  *
  * Two stages, one partitioning:
  *  1. compaction — drop a change row if its tracked values equal the
  *     previous row's (null-safe `<=>`), so runs of identical values
  *     collapse to their first row;
  *  2. intervals — valid_to = next surviving change's timestamp (null on
  *     the current version).
  * Both windows cluster on the key with the same (ts, tiebreak) order,
  * so the whole operator is ONE hash exchange + two window passes —
  * no self-joins, no state carried outside the window frames. The
  * tiebreak column makes interval boundaries deterministic when change
  * timestamps tie.
  */
object Cdc {

  def scd2(changes: DataFrame, key: Seq[String], tsCol: String,
      tieBreak: String, valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val cur = struct(valueCols.map(col): _*)
    val compacted = changes
      .withColumn("__graft_prev", lag(cur, 1).over(w))
      .filter(col("__graft_prev").isNull || !(col("__graft_prev") <=> cur))
    compacted
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__graft_prev")
  }
}
