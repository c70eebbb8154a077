package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the health/quality sweep (SURVEY §2.12 Q24 class)
  * generalized to per-column statistics: row count, null count, distinct
  * count. One aggregate job per profiled table; every stat is
  * partial-aggregable, so the profile of a 100 TB table is a single scan.
  */
object Profiler {

  /** One row per column: (column, n_rows, n_nulls, n_distinct). */
  def profile(df: DataFrame): DataFrame =
    df.columns.toSeq.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count_if(col(c).isNull).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"), col("n_distinct"))
    }.reduce(_ unionAll _)

  /** Single-scan variant: all columns profiled in ONE aggregate pass
    * (count_if + approx or exact distinct per column in the same job) —
    * the shape to prefer on very wide, very large tables. */
  def profileSingleScan(df: DataFrame): DataFrame = {
    val aggs = df.columns.toSeq.flatMap { c =>
      Seq(count_if(col(c).isNull).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val totals = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val row = totals.collect().head
    val rows = df.columns.toSeq.map { c =>
      (c, row.getAs[Long]("__rows"), row.getAs[Long](s"${c}__nulls"),
        row.getAs[Long](s"${c}__distinct"))
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("column", "n_rows", "n_nulls", "n_distinct")
  }
}
