package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the containment pair-stage redesign (r11):
  * times the CURRENT `Dedup.containmentPairs` plan against candidate
  * shapes that remove the full-posting sorts, at a given SF dir.
  * Throwaway-grade: the winner gets ported into `Dedup` with specs;
  * the probe stays for reproducibility of the measurement.
  *
  * Variants:
  *  - `current`   — window-df prune + SMJ pair self-join (r10 shape)
  *  - `anti`      — hash-agg df on the shared exchange, hot shingles
  *                  (df > maxDf) broadcast as an anti-join build side,
  *                  pair self-join left to the planner (SMJ)
  *  - `antihash`  — same, with SHUFFLE_HASH hints so no consumer of
  *                  the posting exchange ever sorts
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val variants = if (args.length > 1) args(1).split(",").toSeq
      else Seq("current", "anti", "antihash")
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    val k = 3; val tau = 0.3; val maxDf = 100

    def tokens(c: org.apache.spark.sql.Column) =
      graft.functions.WsSplitExpr.wsSplit(trim(lower(c)))

    def post0(): DataFrame = graft.ops.Spread.wide(docs, Some(col("doc_id")))
      .select(col("doc_id"), tokens(col("text")).as("__t"))
      .select(col("doc_id"),
        explode(graft.ops.Dedup.shinglesOf(col("__t"), k)).as("__sh"))
      .select(col("doc_id"), graft.ops.Dedup.md5Long(col("__sh")).as("sh"))

    def finish(kept: DataFrame, sizes: DataFrame, pairJoin: DataFrame): DataFrame =
      pairJoin
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
        .select(explode(array(
          struct(col("doc_a"), col("doc_b"), col("shared")),
          struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
            col("shared")))).as("__p"))
        .select(col("__p.doc_a").as("doc_a"), col("__p.doc_b").as("doc_b"),
          col("__p.shared").as("shared"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_sh_a")),
          "doc_a")
        .withColumn("containment",
          round(col("shared") / col("n_sh_a").cast("double"), 4))
        .filter(col("containment") >= tau)
        .select("doc_a", "doc_b", "shared", "n_sh_a", "containment")

    /** The pre-r11 pair tail: mirror ALL aggregated pairs, then join
      * sizes (planner-chosen strategy) — kept for A/B. */
    def old(): DataFrame = {
      val post = post0().repartition(col("sh"))
      val kept = post
        .withColumn("__df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("sh")))
        .filter(col("__df") <= maxDf).drop("__df")
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val oneDir = kept.select(col("sh"), col("doc_id").as("doc_a"))
        .join(kept.select(col("sh"), col("doc_id").as("doc_b")), "sh")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      oneDir.select(explode(array(
          struct(col("doc_a"), col("doc_b"), col("shared")),
          struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
            col("shared")))).as("__p"))
        .select(col("__p.doc_a").as("doc_a"), col("__p.doc_b").as("doc_b"),
          col("__p.shared").as("shared"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_sh_a")),
          "doc_a")
        .withColumn("containment",
          round(col("shared") / col("n_sh_a").cast("double"), 4))
        .filter(col("containment") >= tau)
        .select("doc_a", "doc_b", "shared", "n_sh_a", "containment")
    }

    def anti(hashHint: Boolean): DataFrame = {
      val post = post0().repartition(col("sh"))
      val hot = post.groupBy("sh").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxDf).select("sh")
      val kept = post.join(broadcast(hot), Seq("sh"), "left_anti")
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val left = kept.select(col("sh"), col("doc_id").as("doc_a"))
      val right0 = kept.select(col("sh"), col("doc_id").as("doc_b"))
      val right = if (hashHint) right0.hint("SHUFFLE_HASH") else right0
      val pairJoin = left.join(right, "sh").filter(col("doc_a") < col("doc_b"))
      finish(kept, sizes, pairJoin)
    }

    /** Current shape but the pair-agg key is ONE packed long
      * ((doc_a << 32) | doc_b — ids must fit 32 bits): single-column
      * long hash-agg fast path + 8 fewer key bytes per shuffled row. */
    def packed(): DataFrame = {
      val post = post0().repartition(col("sh"))
      val kept = post
        .withColumn("__df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("sh")))
        .filter(col("__df") <= maxDf).drop("__df")
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val oneDir = kept.select(col("sh"), col("doc_id").as("doc_a"))
        .join(kept.select(col("sh"), col("doc_id").as("doc_b")), "sh")
        .filter(col("doc_a") < col("doc_b"))
        .select((shiftleft(col("doc_a"), 32) + col("doc_b")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("shared"))
        .select(shiftright(col("pk"), 32).as("doc_a"),
          col("pk").bitwiseAND(lit(4294967295L)).as("doc_b"), col("shared"))
      val sizesA = sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_sh_a"))
      val sizesB = sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_sh_b"))
      oneDir.join(broadcast(sizesA), "doc_a").join(broadcast(sizesB), "doc_b")
        .withColumn("__ca", round(col("shared") / col("n_sh_a").cast("double"), 4))
        .withColumn("__cb", round(col("shared") / col("n_sh_b").cast("double"), 4))
        .filter(col("__ca") >= tau || col("__cb") >= tau)
        .select(explode(array(
          struct(col("doc_a"), col("doc_b"), col("shared"),
            col("n_sh_a"), col("__ca").as("containment")),
          struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
            col("shared"), col("n_sh_b").as("n_sh_a"),
            col("__cb").as("containment")))).as("__p"))
        .select(col("__p.doc_a").as("doc_a"), col("__p.doc_b").as("doc_b"),
          col("__p.shared").as("shared"), col("__p.n_sh_a").as("n_sh_a"),
          col("__p.containment").as("containment"))
        .filter(col("containment") >= tau)
    }

    def build(v: String): DataFrame = v match {
      case "current" => graft.ops.Dedup.containmentPairs(docs, k = k,
        tau = tau, maxDf = maxDf)
      case "old" => old()
      case "packed" => packed()
      case "anti" => anti(hashHint = false)
      case "antihash" => anti(hashHint = true)
    }

    // interleave variant runs round-robin so host drift hits all
    // variants equally; report min per variant
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val rows = scala.collection.mutable.Map[String, Long]()
    (1 to runs).foreach { _ =>
      variants.foreach { v =>
        val t0 = System.nanoTime()
        rows(v) = build(v).count()
        acc(v) = ((System.nanoTime() - t0) / 1e9) :: acc(v)
      }
    }
    variants.foreach { v =>
      println(f"""{"metric":"containment_probe","sf":"$sfDir","variant":"$v","sec_min":${acc(v).min}%.3f,"secs":[${acc(v).reverse.map(s => f"$s%.2f").mkString(",")}],"rows":${rows(v)}}""")
    }
    // step decomposition for the winner's anatomy: posting build alone,
    // then prune+sizes, then the pair join (each as its own action)
    def stepTime(df: DataFrame): Double = {
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    val tPost = stepTime(post0())
    val post = post0().repartition(col("sh"))
    val tWindowPrune = stepTime(post
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("__df") <= maxDf))
    val keptS = post
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("__df") <= maxDf).drop("__df")
    val tOneDir = stepTime(keptS.select(col("sh"), col("doc_id").as("doc_a"))
      .join(keptS.select(col("sh"), col("doc_id").as("doc_b")), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared")))
    println(f"""{"metric":"containment_steps","sf":"$sfDir","post_build_sec":$tPost%.2f,"window_prune_sec":$tWindowPrune%.2f,"pair_agg_sec":$tOneDir%.2f}""")
    spark.stop()
  }
}
