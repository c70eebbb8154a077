package graft

import org.apache.spark.sql.functions._

import graft.ops.Spread

/** Spread.wide contract: it exists to parallelize heavy map stages over
  * NARROW local scans, and must be a structural no-op on inputs already
  * wider than the slot count — at scale it may never add a shuffle. */
class SpreadSpec extends SparkSpec {

  test("narrow input is repartitioned to the slot count") {
    import spark.implicits._
    val narrow = (1L to 100L).toDF("doc_id").coalesce(1)
    val out = Spread.wide(narrow, Some(col("doc_id")))
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("wide input passes through untouched — no exchange added") {
    import spark.implicits._
    val slots = spark.sparkContext.defaultParallelism
    val wide = (1L to 100L).toDF("doc_id").repartition(slots * 2, col("doc_id"))
    val out = Spread.wide(wide, Some(col("doc_id")))
    // the ONLY exchange is the caller's own repartition; Spread added none
    val exchanges = out.queryExecution.executedPlan.toString
      .split("Exchange").length - 1
    assert(exchanges == 1, "Spread.wide must not add a shuffle to wide input")
    assert(out.rdd.getNumPartitions == slots * 2)
  }

  test("streaming frame passes through without planning (no .rdd throw)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Long].toDF().withColumnRenamed("value", "doc_id")
    val out = Spread.wide(stream, Some(col("doc_id")))
    assert(out.isStreaming && (out eq stream), "streaming input must be untouched")
  }

  test("parquet scan: plan-walk width agrees with the physical probe") {
    // the r9 estimator must reproduce what df.rdd.getNumPartitions said,
    // for the scan/project/filter shapes every caller passes — same
    // spread/no-spread decision, without planning the frame twice
    for (table <- Seq("documents", "lineitem", "region")) {
      val scan = spark.read.parquet(sf(s"sf0.01/$table.parquet"))
      val shapes = Seq(
        scan,
        scan.select(scan.columns.map(col): _*),
        scan.filter(lit(true)))
      for (df <- shapes) {
        val out = Spread.wide(df)
        val slots = spark.sparkContext.defaultParallelism
        val physical = df.rdd.getNumPartitions
        val spreadFired =
          out.queryExecution.executedPlan.toString.contains("Exchange")
        assert(spreadFired == (physical < slots / 2),
          s"$table: physical=$physical slots=$slots fired=$spreadFired")
      }
    }
  }

  test("unrecognized plan shape falls back to the physical probe") {
    import spark.implicits._
    val agged = (1L to 100L).toDF("doc_id").coalesce(1)
      .groupBy((col("doc_id") % 10).as("k")).count()
    // behavior contract only: same decision the old probe made
    val out = Spread.wide(agged)
    assert(out.count() == 10)
  }

  test("values survive the spread unchanged") {
    import spark.implicits._
    val narrow = (1L to 1000L).toDF("doc_id").coalesce(1)
    val got = Spread.wide(narrow, Some(col("doc_id")))
      .agg(sum("doc_id"), count(lit(1))).head()
    assert(got.getLong(0) == 500500L && got.getLong(1) == 1000L)
  }
}
