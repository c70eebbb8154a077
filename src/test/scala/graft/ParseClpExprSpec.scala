package graft

import org.apache.spark.sql.functions.col
import graft.functions.{ParseClpExpr, PollaFunctions, PollaParsers}

/** The native expression must agree with the pure-Scala parser (and hence
  * the UDF) on the full golden table, through real codegen execution. */
class ParseClpExprSpec extends SparkSpec {

  private val inputs = Seq(
    "690", "$ 690", "4.300", "4,75", "1.234,56", "4300", "$ 4.300", "0,5",
    "4.300 MM", "4,3 M", "1.000.000 Mil", "7500", "99.999", "0,1",
    "1.234.567", "", " ", "$", "abc", "1.2.3.4", null)

  test("native expression matches the Scala parser on goldens + nulls") {
    import spark.implicits._
    ParseClpExpr.register(spark)
    PollaFunctions.register(spark)
    val df = inputs.toDF("raw")
      .selectExpr("raw", "parse_clp_native(raw) AS native", "parse_clp(raw) AS udf")
    val rows = df.collect()
    for (r <- rows) {
      val raw = r.getString(0)
      val native = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val udf = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val expected = Option(raw).flatMap(s => PollaParsers.parseClp(s).toOption)
      assert(native == expected, s"native mismatch for $raw")
      assert(native == udf, s"native vs udf mismatch for $raw")
    }
  }

  test("expression stays inside whole-stage codegen (no ScalaUDF node)") {
    import spark.implicits._
    ParseClpExpr.register(spark)
    val plan = inputs.toDF("raw")
      .selectExpr("parse_clp_native(raw) AS v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "native path must not be a UDF")
  }
}
