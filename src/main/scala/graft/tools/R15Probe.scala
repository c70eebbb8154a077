package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 measurement harness (house rule: probe per-stage wall
  * min-of-N interleaved before believing any ratio or shipping a fix).
  *
  * Topics:
  *  - `q51` — the r14 verdict flagged q51_recursive_cte tripling
  *    (0.15 -> 0.55 s sf0.1 committed) after commit a016c8a swapped the
  *    theta self-join of the 25-row aggregate (ReuseExchange shares the
  *    agg's shuffle) for a collect + LocalRelation self-join. Three
  *    shapes interleaved, min-of-N each:
  *      window  — r13 shape: one plan, theta self-join of the aggregate
  *                against itself (two plan references, shared exchange)
  *      collect — r14 shape: collect the 25-row agg, broadcast theta
  *                self-join of the LocalRelation (two sequential jobs)
  *      cumsum  — r15 shape: collect the 25-row agg, prefix-sum on the
  *                driver (Ids.stableIds pattern), LocalRelation result
  *      agg     — the shared 25-row aggregate alone (collect only) —
  *                the floor every shape pays
  *
  * Usage: R15Probe q51 <sfDir> [runs]
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val topic = args(0)
    val sfDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 5
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
      case "q51" => q51(spark, sfDir, runs)
      case other => sys.error(s"unknown topic $other")
    }
    spark.stop()
  }

  private def q51(spark: SparkSession, d: String, runs: Int): Unit = {
    def cntsPlan: DataFrame =
      spark.read.parquet(s"$d/nation.parquet").select(col("n_nationkey"))
        .join(spark.read.parquet(s"$d/customer.parquet")
            .select(col("c_nationkey"), col("c_custkey")),
          col("n_nationkey") === col("c_nationkey"), "left")
        .groupBy(col("n_nationkey").as("nationkey"))
        .agg(count(col("c_custkey")).as("cnt"))
        .filter(col("nationkey") <= 24)

    val shapes: Seq[(String, () => Long)] = Seq(
      "agg" -> (() => cntsPlan.collect().length.toLong),
      "window" -> { () =>
        val cnts = cntsPlan
        cnts.select(col("nationkey").cast("int").as("depth"))
          .join(broadcast(cnts.select(col("nationkey").as("prior_key"),
              col("cnt"))),
            col("prior_key") < col("depth"), "left")
          .groupBy("depth")
          .agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
          .orderBy("depth").count()
      },
      "collect" -> { () =>
        val p = cntsPlan
        val cnts = spark.createDataFrame(
          java.util.Arrays.asList(p.collect(): _*), p.schema)
        cnts.select(col("nationkey").cast("int").as("depth"))
          .join(broadcast(cnts.select(col("nationkey").as("prior_key"),
              col("cnt"))),
            col("prior_key") < col("depth"), "left")
          .groupBy("depth")
          .agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
          .orderBy("depth").count()
      },
      "cumsum" -> { () =>
        val cnt = cntsPlan.collect()
          .map(r => r.getAs[Number](0).intValue -> r.getLong(1)).toMap
        var acc = 0L
        val totals = (0 to 24).map { dep =>
          val row = (dep, acc); acc += cnt.getOrElse(dep, 0L); row }
        import spark.implicits._
        totals.toDF("depth", "total").orderBy("depth").count()
      })

    // untimed warmup of every shape so janino/codegen is not charged to
    // whichever shape runs first
    shapes.foreach { case (_, f) => f() }
    val walls = collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    (1 to runs).foreach { _ =>
      shapes.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        walls(name) = math.min(walls(name), (System.nanoTime() - t0) / 1e9)
      }
    }
    shapes.foreach { case (name, _) =>
      println(f"[r15probe] q51 $name%-8s min-of-$runs ${walls(name)}%.3f s")
    }
  }
}
