package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.GroupedTopK

/** Native grouped top-k operator: equality with the window form, plan
  * shape (partial prune below the exchange, exact above), invariance. */
class GroupedTopKSpec extends SparkSpec {

  private def votes = Tables.lineitem(spark, sf("sf0.001"))
    .groupBy("l_partkey", "l_suppkey").agg(count(lit(1)).as("cnt"))

  test("native operator equals the window formulation") {
    val byWindow = votes.withColumn("rn", row_number().over(
        Window.partitionBy("l_partkey")
          .orderBy(col("cnt").desc, col("l_suppkey").asc)))
      .filter(col("rn") <= 2).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val byNative = GroupedTopK.perKey(votes, "l_partkey",
        Seq("cnt" -> false, "l_suppkey" -> true), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(byNative == byWindow)
  }

  test("plan: ExactTopK above the exchange, PartialTopK below it") {
    val df = GroupedTopK.perKey(votes, "l_partkey", Seq("cnt" -> false), k = 1)
    df.collect() // materialize through AQE
    val p = df.queryExecution.executedPlan.toString
    val exact = p.indexOf("ExactTopK")
    val exchange = p.indexOf("Exchange hashpartitioning(l_partkey")
    val partial = p.indexOf("PartialTopK")
    assert(exact >= 0 && exchange > exact && partial > exchange, p.take(2000))
  }

  test("composite key: top-1 per (returnflag, linestatus) equals window") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val byWindow = li.withColumn("rn", row_number().over(
        Window.partitionBy("l_returnflag", "l_linestatus")
          .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)))
      .filter(col("rn") === 1)
      .select("l_returnflag", "l_linestatus", "l_orderkey")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val byNative = GroupedTopK.perKeys(li,
        Seq("l_returnflag", "l_linestatus"),
        Seq("l_orderkey" -> true, "l_linenumber" -> true), k = 1)
      .select("l_returnflag", "l_linestatus", "l_orderkey")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(byNative == byWindow)
  }

  test("binary and array keys group by value, not by reference") {
    import spark.implicits._
    // 3 rows per logical key; with reference-equality on copied key
    // values every row would start its own "group" and k=1 would leak
    // all 6 rows instead of 2
    val data = Seq(
      ("alpha", 3L), ("alpha", 1L), ("alpha", 2L),
      ("beta", 6L), ("beta", 4L), ("beta", 5L)).toDF("s", "v")
    val binKeyed = data.withColumn("bk", unhex(md5(col("s")))).drop("s")
    val topBin = GroupedTopK.perKey(binKeyed.repartition(4), "bk",
        Seq("v" -> true), k = 1)
      .collect().map(_.getAs[Long]("v")).sorted.toSeq
    assert(topBin == Seq(1L, 4L), s"binary key grouping broken: $topBin")

    val arrKeyed = data.withColumn("ak", array(col("s"), lit("x"))).drop("s")
    val topArr = GroupedTopK.perKey(arrKeyed.repartition(4), "ak",
        Seq("v" -> true), k = 1)
      .collect().map(_.getAs[Long]("v")).sorted.toSeq
    assert(topArr == Seq(1L, 4L), s"array key grouping broken: $topArr")
  }

  test("partition-count invariant, ragged keys, null-safe ordering") {
    import spark.implicits._
    val data = Seq(
      (1L, Some(5L)), (1L, None), (1L, Some(9L)),
      (2L, Some(2L)), (3L, None)).map { case (k, v) => (k, v.map(Long.box).orNull) }
      .toDF("k", "v")
    def run(parts: Int) = GroupedTopK.perKey(data.repartition(parts), "k",
        Seq("v" -> true), k = 2)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sorted(
        Ordering.by((t: (Long, Option[Any])) => (t._1, t._2.map(_.toString).getOrElse(""))))
      .toSeq
    assert(run(1) == run(7))
    // nulls-first ascending (Spark default) — null is in the top-2 of key 1
    assert(run(1).count(_._1 == 1L) == 2)
    assert(run(1).exists(t => t._1 == 1L && t._2.isEmpty))
  }
}
