package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 measurement harness (house rule: probe per-variant wall
  * min-of-N interleaved before shipping any plan change).
  *
  * Topics:
  *  - `q06` — theta-join shape A/B: the declared equi+residual join
  *    planned a shuffle on BOTH sides (lineitem 60 M rows sorted/
  *    exchanged at sf10 for a 4.9× oracle ratio). `part`'s join payload
  *    is two ints (~16 MB at sf10) — candidate for an explicit
  *    broadcast that skips the fact shuffle entirely, and for a
  *    SHUFFLE_HASH fallback that at least kills the sorts. Variants:
  *    declared | bcast | shj.
  *
  * Usage: R13Probe q06 <sfDir> [runs]
  */
object R13Probe {
  def main(args: Array[String]): Unit = {
    val topic = args(0)
    val sfDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    topic match {
      case "q06" => q06(spark, sfDir, runs)
      case "pagerank" => pagerank(spark, sfDir, runs)
      case other => sys.error(s"unknown topic $other")
    }
    spark.stop()
  }

  /** graph_pagerank edge-build shape A/B at a given SF. The declared
    * build is lineitem⋈orders SMJ + distinct on STRING node ids — the
    * same fact-fact join class q19's r12 probe moved to SHUFFLE_HASH,
    * plus a 60 M-row string exchange that could be long pairs. Variants:
    *  - declared:  current shape
    *  - shj:       + shuffle_hash hint on the orderkey join
    *  - longdist:  distinct on (custkey, suppkey) LONGS, concat after
    *  - nodist:    no query-side distinct at all (pageRank's und build
    *               window-dedupes anyway) — measures whether the early
    *               reduction pays for its exchange
    */
  private def pagerank(spark: SparkSession, d: String, runs: Int): Unit = {
    def lineitem = spark.read.parquet(s"$d/lineitem.parquet")
    def orders = spark.read.parquet(s"$d/orders.parquet")
    def li = lineitem.select("l_orderkey", "l_suppkey")
    def os = orders.select("o_orderkey", "o_custkey")
    def toNodes(df: DataFrame): DataFrame = df
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "declared" -> (() => toNodes(
        li.join(os, col("l_orderkey") === col("o_orderkey"))).distinct()),
      "shj" -> (() => toNodes(
        li.join(os.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))).distinct()),
      "longdist" -> (() => toNodes(
        li.join(os.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
          .select("o_custkey", "l_suppkey").distinct())),
      "nodist" -> (() => toNodes(
        li.join(os.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey")))))

    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to runs; (name, mk) <- variants) {
      // bench-grade hygiene between measurements: the previous run's
      // localCheckpoint blocks (und/degs/ranks) otherwise accumulate
      // and each successive pagerank pays more GC than the last
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.pageRank(mk(), "src", "dst", iters = 5)
        .orderBy("node").count()
      val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      println(f"[probe] pagerank/$name%-9s run$r $dt%6.2f s rows=$n")
    }
    best.toSeq.sortBy(_._2).foreach { case (n, v) =>
      println(f"[best] pagerank/$n%-9s $v%6.2f s")
    }
  }

  private def q06(spark: SparkSession, d: String, runs: Int): Unit = {
    def part = spark.read.parquet(s"$d/part.parquet")
    def lineitem = spark.read.parquet(s"$d/lineitem.parquet")

    def finish(joined: DataFrame): DataFrame = joined
      .groupBy("p_partkey").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p_partkey")).limit(100)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "declared" -> (() => finish(part.join(lineitem,
        col("l_partkey") === col("p_partkey") &&
          col("l_quantity") > col("p_size")))),
      // skinny projection first so only (partkey, size) ships
      "bcast" -> (() => finish(
        lineitem.select("l_partkey", "l_quantity")
          .join(broadcast(part.select("p_partkey", "p_size")),
            col("l_partkey") === col("p_partkey") &&
              col("l_quantity") > col("p_size")))),
      "shj" -> (() => finish(
        lineitem.select("l_partkey", "l_quantity")
          .join(part.select("p_partkey", "p_size").hint("shuffle_hash"),
            col("l_partkey") === col("p_partkey") &&
              col("l_quantity") > col("p_size")))))

    // print the join node each variant plans
    variants.foreach { case (name, mk) =>
      val plan = mk().queryExecution.executedPlan.toString
      val node = plan.linesIterator.find(l => l.contains("Join")).getOrElse("?")
      println(s"[plan] $name: ${node.trim.take(120)}")
    }
    // interleaved min-of-N
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to runs; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      val n = mk().count()
      val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      println(f"[probe] q06/$name%-10s $dt%6.2f s rows=$n")
    }
    best.toSeq.sortBy(_._2).foreach { case (n, v) =>
      println(f"[best] q06/$n%-10s $v%6.2f s")
    }
  }
}
