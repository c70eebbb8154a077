package graft

import org.apache.spark.sql.functions._

/** Pins the footer-served aggregate path (`Tables.footerScan`, a child
  * session with `useV1SourceList=""` + `parquet.aggregatePushdown=true`):
  *  - the plan actually carries `PushedAggregation` (a silently-degraded
  *    full scan would still return correct values, so only a plan pin
  *    catches the regression);
  *  - values equal the default V1 full-scan path;
  *  - the parent session's conf is untouched — footerScan must never leak
  *    its V2 routing into the session that serves every other scan
  *    (bucketed-join support is V1-only).
  */
class FooterStatsSpec extends SparkSpec {
  private val d = sf("sf0.001")

  /** Execute once; return the finalized (post-AQE) plan string + rows. */
  private def executed(df: org.apache.spark.sql.DataFrame)
      : (String, Array[org.apache.spark.sql.Row]) = {
    val rows = df.collect()
    (df.queryExecution.executedPlan.toString, rows)
  }

  test("footerScan count(*) is answered from footer statistics") {
    val v2 = Tables.footerScan(spark, d, "lineitem").agg(count(lit(1)).as("n"))
    val (plan, rows) = executed(v2)
    assert(plan.contains("PushedAggregation: [COUNT(*)]"), plan)
    assert(!plan.contains("FileScan"), s"expected a DSv2 BatchScan:\n$plan")
    val expected = Tables.load(spark, d, "lineitem").count()
    assert(rows(0).getLong(0) === expected)
  }

  test("footerScan numeric MIN/MAX pushes and matches the full scan") {
    val v2 = Tables.footerScan(spark, d, "lineitem")
      .agg(min(col("l_orderkey")).as("mn"), max(col("l_quantity")).as("mx"))
    val (plan, rows) = executed(v2)
    assert(plan.contains("PushedAggregation"), plan)
    assert(plan.contains("MIN(l_orderkey)") && plan.contains("MAX(l_quantity)"), plan)
    val Array(want) = Tables.load(spark, d, "lineitem")
      .agg(min(col("l_orderkey")), max(col("l_quantity"))).collect()
    assert(rows(0) === want)
  }

  test("a filter keeps the aggregate OFF the footer path (still correct)") {
    val v2 = Tables.footerScan(spark, d, "lineitem")
      .filter(col("l_quantity") > 25).agg(count(lit(1)).as("n"))
    val (plan, rows) = executed(v2)
    assert(!plan.contains("PushedAggregation: [COUNT(*)]"), plan)
    val expected =
      Tables.load(spark, d, "lineitem").filter(col("l_quantity") > 25).count()
    assert(rows(0).getLong(0) === expected)
  }

  test("footerScan leaves the parent session's planning untouched") {
    val key = "spark.sql.sources.useV1SourceList"
    val before = spark.conf.getOption(key)
    val frame = Tables.footerScan(spark, d, "orders")
    // the frame rides its own child session, not the parent
    assert(frame.sparkSession ne spark)
    assert(spark.conf.getOption(key) === before)
    assert(spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
      .forall(_ == "false"))
    // and the parent's default path still plans as a V1 FileScan
    val plan = Tables.load(spark, d, "orders").queryExecution.executedPlan.toString
    assert(plan.contains("FileScan"), plan)
  }

  test("q24 executed plan is footer-served for every table") {
    val q = Queries.all.find(_.name == "q24_table_counts").get
    val (plan, rows) = executed(q.fn(spark, d))
    assert(rows.length === Tables.names.size)
    // AQE's executed-plan string prints both the Final and Initial plans,
    // so each table's scan line appears twice — require at least one
    // footer-served scan per table and no V1 FileScan anywhere.
    val pushed = "PushedAggregation: \\[COUNT\\(\\*\\)\\]".r.findAllIn(plan).size
    assert(pushed >= Tables.names.size, s"pushed=$pushed\n$plan")
    assert(!plan.contains("FileScan"), plan)
  }

  test("footerRowCount recurses into partitioned layouts and fails loudly " +
      "on empty dirs") {
    // r12 ADVICE: non-recursive listing silently undercounted a
    // partitioned table to 0, and that 0 feeds containmentPairs'
    // broadcast gate — exactly the driver-OOM the gate exists to prevent.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-frc").toString
    val df = (1 to 100).map(i => (i.toLong, i % 4)).toDF("id", "p")
    df.write.partitionBy("p").parquet(s"$tmp/nested.parquet")
    assert(Tables.footerRowCount(spark, tmp, "nested") === 100L)
    // flat layout unchanged
    df.write.parquet(s"$tmp/flat.parquet")
    assert(Tables.footerRowCount(spark, tmp, "flat") === 100L)
    // a dir with no parquet files must refuse to report 0
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp/empty.parquet"))
    val e = intercept[IllegalArgumentException] {
      Tables.footerRowCount(spark, tmp, "empty")
    }
    assert(e.getMessage.contains("no .parquet files"))
  }

  test("profile_footer_stats matches the full-scan values") {
    val q = Queries.all.find(_.name == "profile_footer_stats").get
    val (plan, rows) = executed(q.fn(spark, d))
    assert(plan.contains("PushedAggregation"), plan)
    val Array(want) = Tables.load(spark, d, "lineitem")
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")),
        min(col("l_quantity")), max(col("l_quantity")),
        min(col("l_extendedprice")), max(col("l_extendedprice"))).collect()
    assert(rows(0).toSeq === want.toSeq)
  }
}
