package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 stage decomposition of `Dedup.containmentPairs` (VERDICT r15
  * item 1): the sf100 suite reads 631–782 s, 30–37×/decade sf10→sf100
  * while shuffle grows only 4× — the wall is in-partition, and nobody
  * has measured WHICH stage. This probe times nested plan prefixes
  * (each includes its predecessors, so deltas attribute cost) and
  * snapshots cumulative task metrics (executor run/GC time, shuffle
  * read/write, memory/disk spill, peak task count) between prefixes via
  * a stage listener — distinguishing "hash-agg spill", "sort cost",
  * "pair-stream CPU", and "exchange volume" without guessing.
  *
  * Prefixes (declared-query params: k=3, tau=0.3, maxDf=100,
  * skewSafe=false):
  *   posting    — tokenize+shingle+md5 map side + repartition(sh)
  *   dfprune    — + window df count + filter (the per-partition sh sort)
  *   pairstream — + self-join + a<b filter (pair GENERATION, counted
  *                through a metadata-only agg, no pair hash map)
  *   pairagg    — + groupBy(doc_a,doc_b).count (the distinct-pair hash
  *                aggregate — the suspected spill site)
  *   full       — the shipped operator end to end
  *
  * Throwaway-grade measurement harness in the ContainmentProbe class;
  * findings land in SCALE.md and any fix ships in Dedup with specs. */
object ContainmentStages {

  final case class Snap(wallSec: Double, runSec: Double, gcSec: Double,
      shufReadMB: Double, shufWriteMB: Double, memSpillMB: Double,
      diskSpillMB: Double, tasks: Long)

  final class Acc extends SparkListener {
    var runMs = 0L; var gcMs = 0L; var shufRead = 0L; var shufWrite = 0L
    var memSpill = 0L; var diskSpill = 0L; var tasks = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          runMs += m.executorRunTime; gcMs += m.jvmGCTime
          shufRead += m.shuffleReadMetrics.totalBytesRead
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          memSpill += m.memoryBytesSpilled; diskSpill += m.diskBytesSpilled
          tasks += sc.stageInfo.numTasks
        }
      }
    def snap(wall: Double): Snap = synchronized {
      Snap(wall, runMs / 1e3, gcMs / 1e3, shufRead / 1048576.0,
        shufWrite / 1048576.0, memSpill / 1048576.0, diskSpill / 1048576.0,
        tasks)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 1
    val only = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan

    val k = 3; val tau = 0.3; val maxDf = 100
    def tokens(c: Column) = graft.functions.WsSplitExpr.wsSplit(trim(lower(c)))
    def post0(): DataFrame = graft.ops.Spread.wide(docs, Some(col("doc_id")))
      .select(col("doc_id"), tokens(col("text")).as("__t"))
      .select(col("doc_id"),
        explode(graft.ops.Dedup.shinglesOf(col("__t"), k)).as("__sh"))
      .select(col("doc_id"), graft.ops.Dedup.md5Long(col("__sh")).as("sh"))
    def post() = post0().repartition(col("sh"))
    def kept() = post()
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("__df") <= maxDf).drop("__df")
    def pairStream() = {
      val kp = kept()
      kp.select(col("sh"), col("doc_id").as("doc_a"))
        .join(kp.select(col("sh"), col("doc_id").as("doc_b")), "sh")
        .filter(col("doc_a") < col("doc_b"))
    }
    def pairAgg() = pairStream()
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    def full() = graft.ops.Dedup.containmentPairs(docs, k = k, tau = tau,
      maxDf = maxDf, corpusDocs = Some(docs.count()))

    val prefixes: Seq[(String, () => DataFrame)] = Seq(
      "posting" -> (() => post()),
      "dfprune" -> (() => kept()),
      "pairstream" -> (() => pairStream()),
      "pairagg" -> (() => pairAgg()),
      "full" -> (() => full()))

    prefixes.filter(p => only.isEmpty || only(p._1)).foreach { case (name, f) =>
      val samples = (1 to runs).map { _ =>
        val before = acc.snap(0)
        val t0 = System.nanoTime()
        val n = f().count()
        val wall = (System.nanoTime() - t0) / 1e9
        val after = acc.snap(wall)
        (Snap(wall, after.runSec - before.runSec, after.gcSec - before.gcSec,
          after.shufReadMB - before.shufReadMB,
          after.shufWriteMB - before.shufWriteMB,
          after.memSpillMB - before.memSpillMB,
          after.diskSpillMB - before.diskSpillMB,
          after.tasks - before.tasks), n)
      }
      val (s, n) = samples.minBy(_._1.wallSec)
      println(f"""{"stage":"$name","rows":$n,"wall_sec":${s.wallSec}%.1f,""" +
        f""""exec_run_sec":${s.runSec}%.1f,"gc_sec":${s.gcSec}%.1f,""" +
        f""""shuffle_read_mb":${s.shufReadMB}%.0f,"shuffle_write_mb":${s.shufWriteMB}%.0f,""" +
        f""""mem_spill_mb":${s.memSpillMB}%.0f,"disk_spill_mb":${s.diskSpillMB}%.0f,""" +
        f""""tasks":${s.tasks},"runs":$runs}""")
    }
    spark.stop()
  }
}
