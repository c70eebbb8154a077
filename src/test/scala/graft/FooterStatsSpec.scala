package graft

import org.apache.spark.sql.functions._

/** Pins the footer-served aggregate path (`Tables.footerScan` +
  * `spark.sql.parquet.aggregatePushdown`):
  *  - the plan actually carries `PushedAggregation` (a silently-degraded
  *    full scan would still return correct values, so only a plan pin
  *    catches the regression);
  *  - values equal the default V1 full-scan path;
  *  - the session-global V1 source list is restored after the scoped read,
  *    so bucketed-join support (V1-only) is untouched for everything else.
  */
class FooterStatsSpec extends SparkSpec {
  private val d = sf("sf0.001")

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  test("footerScan count(*) is answered from footer statistics") {
    val v2 = Tables.footerScan(spark, d, "lineitem").agg(count(lit(1)).as("n"))
    val plan = executed(v2)
    assert(plan.contains("PushedAggregation: [COUNT(*)]"), plan)
    assert(!plan.contains("FileScan"), s"expected a DSv2 BatchScan:\n$plan")
    val expected = Tables.load(spark, d, "lineitem").count()
    assert(v2.collect()(0).getLong(0) === expected)
  }

  test("footerScan numeric MIN/MAX pushes and matches the full scan") {
    val v2 = Tables.footerScan(spark, d, "lineitem")
      .agg(min(col("l_orderkey")).as("mn"), max(col("l_quantity")).as("mx"))
    val plan = executed(v2)
    assert(plan.contains("PushedAggregation"), plan)
    assert(plan.contains("MIN(l_orderkey)") && plan.contains("MAX(l_quantity)"), plan)
    val Array(got) = v2.collect()
    val Array(want) = Tables.load(spark, d, "lineitem")
      .agg(min(col("l_orderkey")), max(col("l_quantity"))).collect()
    assert(got === want)
  }

  test("a filter keeps the aggregate OFF the footer path (still correct)") {
    val v2 = Tables.footerScan(spark, d, "lineitem")
      .filter(col("l_quantity") > 25).agg(count(lit(1)).as("n"))
    val plan = executed(v2)
    assert(!plan.contains("PushedAggregation: [COUNT(*)]"), plan)
    val expected =
      Tables.load(spark, d, "lineitem").filter(col("l_quantity") > 25).count()
    assert(v2.collect()(0).getLong(0) === expected)
  }

  test("footerScan restores the V1 source list after the scoped read") {
    val key = "spark.sql.sources.useV1SourceList"
    val before = spark.conf.getOption(key)
    Tables.footerScan(spark, d, "orders")
    assert(spark.conf.getOption(key) === before)
    // and the default path still plans as a V1 FileScan
    val plan = Tables.load(spark, d, "orders").queryExecution.executedPlan.toString
    assert(plan.contains("FileScan"), plan)
  }

  test("q24 executed plan is footer-served for every table") {
    val q = Queries.all.find(_.name == "q24_table_counts").get
    val df = q.fn(spark, d)
    val plan = executed(df)
    // AQE's executed-plan string prints both the Final and Initial plans,
    // so each table's scan line appears twice — require at least one
    // footer-served scan per table and no V1 FileScan anywhere.
    val pushed = "PushedAggregation: \\[COUNT\\(\\*\\)\\]".r.findAllIn(plan).size
    assert(pushed >= Tables.names.size, s"pushed=$pushed\n$plan")
    assert(!plan.contains("FileScan"), plan)
  }

  test("profile_footer_stats matches the full-scan values") {
    val q = Queries.all.find(_.name == "profile_footer_stats").get
    val df = q.fn(spark, d)
    val plan = executed(df)
    assert(plan.contains("PushedAggregation"), plan)
    val Array(got) = df.collect()
    val Array(want) = Tables.load(spark, d, "lineitem")
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")),
        min(col("l_quantity")), max(col("l_quantity")),
        min(col("l_extendedprice")), max(col("l_extendedprice"))).collect()
    assert(got.toSeq === want.toSeq)
  }
}
