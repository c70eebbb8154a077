package graft.tools

import org.apache.spark.sql.SparkSession

/** Containment ±skewSafe timing at a given SF dir — the one heavy-op
  * variant the declared-query bench can't cover (the oracle query pins
  * `skewSafe = false`; the CMS-prefiltered mode is the 100 TB skew
  * path, SURVEY §2.13 / VERDICT r8 item 4). Prints one JSON line. */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm scan
    def time(skewSafe: Boolean): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Dedup.containmentPairs(docs, k = 3, tau = 0.3,
          skewSafe = skewSafe).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    val plain = time(skewSafe = false)
    val safe = time(skewSafe = true)
    println(f"""{"metric":"containment_modes","sf":"$sfDir","plain_sec":$plain%.3f,"skew_safe_sec":$safe%.3f,"runs":$runs}""")

    // phash pair enumeration ± the maxBucket hot-bucket cap: on a corpus
    // with large near-identical media clusters the pair OUTPUT is
    // quadratic in cluster size — exact enumeration must pay it; the cap
    // bounds each (chunk, value) bucket and is the declared 100 TB knob
    // (same contract as Dedup.minhashCandidates's maxBucket).
    def timePhash(cap: Option[Int]): (Double, Long) = {
      val media = graft.ops.Multimodal.syntheticMedia(spark, docs)
      val hashes = graft.ops.Multimodal.perceptualHash(
        media, new graft.ops.Multimodal.StubCodec())
      var n = 0L
      val sec = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        n = graft.ops.Multimodal.phashPairs(hashes, maxBucket = cap).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (sec, n)
    }
    val (pOff, nOff) = timePhash(None)
    val (pOn, nOn) = timePhash(Some(256))
    println(f"""{"metric":"phash_cap_modes","sf":"$sfDir","uncapped_sec":$pOff%.3f,"uncapped_pairs":$nOff,"cap256_sec":$pOn%.3f,"cap256_pairs":$nOn,"runs":$runs}""")
    spark.stop()
  }
}
