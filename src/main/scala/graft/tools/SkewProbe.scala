package graft.tools
import org.apache.spark.sql.SparkSession

object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", args.lift(1).getOrElse("32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(skewSafe: Boolean): (Long, Double) = {
      var n = 0L
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        n = graft.ops.Dedup.containmentPairs(docs, k = 3, tau = 0.3,
          skewSafe = skewSafe).count()
        (System.nanoTime() - t0) / 1e9
      }
      (n, secs.min)
    }
    val (ns, ts) = run(skewSafe = true)
    val (np, tp) = run(skewSafe = false)
    println(f"PROBE sf=$sfDir plain_pairs=$np plain_sec=$tp%.1f skewsafe_pairs=$ns skewsafe_sec=$ts%.1f")
    spark.stop()
  }
}
