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
    spark.stop()
  }
}
