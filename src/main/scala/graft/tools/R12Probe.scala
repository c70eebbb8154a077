package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-12 measurement harness (the house rule: probe per-step wall
  * before shipping any redesign; min-of-N interleaved so host drift hits
  * every variant equally).
  *
  * Topics:
  *  - `q19`  — snowflake-join shape A/B at a given SF: the r10 PlanSpec
  *    pin chose direct broadcast-dims + fact-fact SMJ, measured at sf1
  *    only; sf10 reads 5.4× the DuckDB oracle, so re-measure pre-agg-
  *    below-join and SHUFFLE_HASH variants AT SF10 (r11 verdict item 1).
  *  - `skew` — q54 salted join vs the PLAIN Spark join on the same
  *    skewed data (r11 verdict item 5: does the salt beat unsalted
  *    Spark, or is the declared query demonstrating an anti-opt?).
  *  - `lshrecall` — stage decomposition of dedup_lsh_recall (r11
  *    verdict item 7: truth-pair stage vs candidate join vs the
  *    full-outer grade, before touching anything).
  *
  * Usage: R12Probe <topic> <sfDir> [variants] [runs]
  */
object R12Probe {
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  def main(args: Array[String]): Unit = {
    val topic = args(0)
    val sfDir = args(1)
    val variantsArg = if (args.length > 2) Some(args(2).split(",").toSeq) else None
    val runs = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "64g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    topic match {
      case "q19" => q19(spark, sfDir, variantsArg, runs, t)
      case "skew" => skew(spark, sfDir, variantsArg, runs, t)
      case "lshrecall" => lshRecall(spark, sfDir, runs, t)
      case other => sys.error(s"unknown topic $other")
    }
    spark.stop()
  }

  // ---------------------------------------------------------------- q19
  private def q19(spark: SparkSession, d: String,
      variantsArg: Option[Seq[String]], runs: Int,
      t: String => (=> Long) => Unit): Unit = {
    def tbl(n: String) = spark.read.parquet(s"$d/$n.parquet")
    def dims() = tbl("supplier")
      .join(broadcast(tbl("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(tbl("region")), col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "r_name")

    /** The shipped shape: dims broadcast onto lineitem, SMJ with orders. */
    def current(): DataFrame = tbl("lineitem")
      .join(broadcast(dims()), col("l_suppkey") === col("s_suppkey"))
      .join(tbl("orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("y"))
      .agg(round(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))), 2)
        .cast("double").as("rev"))
      .orderBy("r_name", "y")

    /** SHUFFLE_HASH hint on the fact-fact join: skips both sorts. */
    def shj(): DataFrame = tbl("lineitem")
      .join(broadcast(dims()), col("l_suppkey") === col("s_suppkey"))
      .join(tbl("orders").hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("y"))
      .agg(round(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))), 2)
        .cast("double").as("rev"))
      .orderBy("r_name", "y")

    /** Pre-agg below the join: collapse lineitem to (orderkey, r_name)
      * partial decimal sums BEFORE the orders join (decimal addition is
      * exact, so re-summing partials is value-identical), and project
      * orders to (o_orderkey, y) so both join inputs are skinny. */
    def preagg(ordersHint: Option[String]): DataFrame = {
      val lpart = tbl("lineitem")
        .join(broadcast(dims()), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_orderkey"), col("r_name"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("pr"))
      val o0 = tbl("orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("y"))
      val o = ordersHint.map(o0.hint(_)).getOrElse(o0)
      lpart.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("r_name"), col("y"))
        .agg(round(sum(col("pr")), 2).cast("double").as("rev"))
        .orderBy("r_name", "y")
    }

    /** SHJ + skinny exchange: revenue contribution computed map-side
      * (decimal cast BEFORE the shuffle — addition order free), the
      * region carried as its int key through the join/agg and the name
      * re-attached to the 35-row aggregate. */
    def shjSkinny(): DataFrame = {
      val dimsK = tbl("supplier")
        .join(broadcast(tbl("nation")), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_regionkey")
      val l = tbl("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          dec(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("pr"))
        .join(broadcast(dimsK), col("l_suppkey") === col("s_suppkey"))
        .select("l_orderkey", "n_regionkey", "pr")
      val o = tbl("orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("y"))
        .hint("shuffle_hash")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_regionkey"), col("y"))
        .agg(round(sum(col("pr")), 2).cast("double").as("rev"))
        .join(broadcast(tbl("region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("y"), col("rev"))
        .orderBy("r_name", "y")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "current" -> (() => current()),
      "shj" -> (() => shj()),
      "shj_skinny" -> (() => shjSkinny()),
      "preagg" -> (() => preagg(None)),
      "preagg_shj" -> (() => preagg(Some("shuffle_hash"))))
      .filter { case (n, _) => variantsArg.forall(_.contains(n)) }

    // value parity first (cheap — 35 result rows)
    val ref = variants.head._2().collect().map(_.toSeq).toSeq
    variants.tail.foreach { case (n, f) =>
      val got = f().collect().map(_.toSeq).toSeq
      require(got == ref, s"variant $n disagrees with ${variants.head._1}")
    }
    println(s"[probe] q19 parity OK across ${variants.size} variants (${ref.size} rows)")
    for (r <- 1 to runs; (n, f) <- variants)
      t(s"q19/$n#$r") { f().count() }
  }

  // ---------------------------------------------------------------- skew
  private def skew(spark: SparkSession, d: String,
      variantsArg: Option[Seq[String]], runs: Int,
      t: String => (=> Long) => Unit): Unit = {
    // the q54 declared inputs, exactly (Queries.scala q54)
    def tbl(n: String) = spark.read.parquet(s"$d/$n.parquet")
    def facts() = tbl("lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    def dims() = tbl("supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    def finish(joined: DataFrame): DataFrame = joined
      .groupBy("s_nationkey")
      .agg(round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("s_nationkey")

    def salted(): DataFrame = finish(
      graft.ops.Skew.saltedJoin(facts(), dims(), "l_suppkey",
        factId = concat(col("l_orderkey"), lit("#"), col("l_linenumber")),
        saltBuckets = 8))
    // what a user writing the plain join gets (AQE at session defaults;
    // the dim is small, so the planner broadcasts it — the honest
    // baseline salting must beat to justify itself on THIS data)
    def plain(): DataFrame = finish(facts().join(dims(), Seq("l_suppkey")))
    // plain with the broadcast disabled — the shape a too-big-to-
    // broadcast dim would take, where salting is actually aimed
    def plainShuffle(): DataFrame = finish(
      facts().join(dims().hint("merge"), Seq("l_suppkey")))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "salted" -> (() => salted()),
      "plain" -> (() => plain()),
      "plain_smj" -> (() => plainShuffle()))
      .filter { case (n, _) => variantsArg.forall(_.contains(n)) }
    val ref = variants.head._2().collect().map(_.toSeq).toSeq
    variants.tail.foreach { case (n, f) =>
      require(f().collect().map(_.toSeq).toSeq == ref, s"variant $n disagrees") }
    println(s"[probe] skew parity OK (${ref.size} rows)")
    for (r <- 1 to runs; (n, f) <- variants)
      t(s"skew/$n#$r") { f().count() }
  }

  // ----------------------------------------------------------- lshrecall
  /** Stage decomposition of the DECLARED dedup_lsh_recall query (docs
    * filtered to doc_id < 300 — a bounded grading subset): where do the
    * 4.1 s at sf10 go? scan+filter vs truth all-pairs vs candidate gen
    * vs the assembled op. */
  private def lshRecall(spark: SparkSession, d: String, runs: Int,
      t: String => (=> Long) => Unit): Unit = {
    import graft.ops.Dedup
    def filtered() = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") < 300)
    def toks(c: org.apache.spark.sql.Column) =
      graft.functions.WsSplitExpr.wsSplit(trim(lower(c)))
    for (r <- 1 to runs) {
      t(s"scanfilter#$r") { filtered().count() }
      t(s"truth#$r") {
        val docs = graft.ops.Spread.wide(filtered(), Some(col("doc_id")))
        val a = docs.select(col("doc_id").as("doc_a"), toks(col("text")).as("__t"))
          .select(col("doc_a"), Dedup.shinglesOf(col("__t"), 3).as("toks_a"))
        val b = docs.select(col("doc_id").as("doc_b"), toks(col("text")).as("__t"))
          .select(col("doc_b"), Dedup.shinglesOf(col("__t"), 3).as("toks_b"))
        Dedup.jaccardPairs(a.join(b, col("doc_a") < col("doc_b")))
          .filter(col("jaccard") >= 0.5).count()
      }
      t(s"cand#$r") {
        Dedup.minhashCandidates(filtered(), 64, 16,
          minEst = 0.0, portable = true).count()
      }
      t(s"full#$r") { Dedup.lshRecall(filtered(), threshold = 0.5).count() }
    }
  }
}
