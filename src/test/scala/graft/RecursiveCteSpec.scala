package graft

import org.apache.spark.sql.functions._

/** Pins that Spark 4's literal WITH RECURSIVE execution agrees with the
  * closed-form prefix-sum plan Queries.q51 actually ships.
  *
  * q51 is a bounded linear recursion (total += cnt(depth) per step); the
  * engine rewrites it as a cumulative window because executing the
  * recursion literally costs one sequential Spark job per depth (~3 s for
  * 25 rows even over a 25-row LocalRelation). This spec keeps the literal
  * recursion exercised so the rewrite stays honest.
  */
class RecursiveCteSpec extends SparkSpec {

  test("q51 closed form ≡ literal WITH RECURSIVE on sf0.001") {
    val d = sf("sf0.001")
    val closed = Queries.all.find(_.name == "q51_recursive_cte").get
      .fn(spark, d).collect().toSeq

    // Literal recursion over the same 25-row pre-agg, as a LocalRelation
    // so the recursive step never re-reads parquet.
    val cnts = spark.read.parquet(s"$d/nation.parquet").select(col("n_nationkey"))
      .join(spark.read.parquet(s"$d/customer.parquet")
        .select(col("c_nationkey"), col("c_custkey")),
        col("n_nationkey") === col("c_nationkey"), "left")
      .groupBy(col("n_nationkey").as("nationkey"))
      .agg(count(col("c_custkey")).as("cnt"))
    spark.createDataFrame(java.util.Arrays.asList(cnts.collect(): _*), cnts.schema)
      .createOrReplaceTempView("nation_counts_rec_spec")
    val literal = spark.sql(
      """WITH RECURSIVE r(depth, total) AS (
        |  SELECT 0, CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT depth + 1, total + (
        |    SELECT cnt FROM nation_counts_rec_spec WHERE nationkey = depth)
        |  FROM r WHERE depth < 24)
        |SELECT depth, total FROM r ORDER BY depth""".stripMargin)

    assert(literal.schema.map(f => (f.name, f.dataType)) ===
      Seq(("depth", org.apache.spark.sql.types.IntegerType),
        ("total", org.apache.spark.sql.types.LongType)))
    assert(literal.collect().toSeq === closed)
    assert(closed.size === 25)
  }
}
