package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Anatomy of the `dedup_clusters` sf10 gap (r10 verdict item 6: 11.7 s
  * vs DuckDB's 2.1 s recursive CTE): the declared query's input is a
  * FIXED 300-doc slice, so the wall is all fixed overhead — this probe
  * splits it into pair generation vs connected-components rounds, and
  * reports the round count, so the fix targets the real cost. */
object ClustersProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
    docsAll.count()
    def timed(f: => Long): (Double, Long) = {
      val r = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (r.map(_._1).min, r.head._2)
    }
    val docs = docsAll.filter(col("doc_id") < 300)
    // r12: the declared pair stage is the posting equi-join now
    def pairsDf = graft.ops.Dedup.tokenJaccardPairs(docs, threshold = 0.5)
    val (tPairs, nPairs) = timed(pairsDf.count())
    val (tFull, nFull) = timed(
      graft.ops.Dedup.clusters(docs, pairsDf).count())
    val t0 = System.nanoTime()
    val (_, rounds) = graft.ops.Dedup.ccWithRounds(
      pairsDf.select(col("doc_a").as("u"), col("doc_b").as("v")))
    val tCc = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"clusters_probe","sf":"$sfDir","pairs_sec":$tPairs%.2f,"pairs":$nPairs,"full_sec":$tFull%.2f,"rows":$nFull,"cc_sec":$tCc%.2f,"cc_rounds":$rounds}""")
    spark.stop()
  }
}
