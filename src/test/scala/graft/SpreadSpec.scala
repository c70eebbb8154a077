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

  test("values survive the spread unchanged") {
    import spark.implicits._
    val narrow = (1L to 1000L).toDF("doc_id").coalesce(1)
    val got = Spread.wide(narrow, Some(col("doc_id")))
      .agg(sum("doc_id"), count(lit(1))).head()
    assert(got.getLong(0) == 500500L && got.getLong(1) == 1000L)
  }
}
