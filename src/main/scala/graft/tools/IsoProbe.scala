package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated declared-query probe WITH task-metrics telemetry (r16,
  * VERDICT items 2/4): runs named `Queries.all` entries in a fresh
  * session and prints EVERY sample (not just the min) with executor
  * run/GC seconds, shuffle read/write, and spill from a stage listener —
  * the evidence that distinguishes "ambient host noise" from "GC
  * pressure" or "checkpoint I/O" when a wall swings between runs of
  * unchanged code (graph_pagerank moved 1145 → 1609 s between the two
  * r15 sf100 suite passes; no telemetry could say why).
  *
  * Usage: IsoProbe <sfDir> <runs> <name1,name2,...>  */
object IsoProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    // Honor the same big-SF survival knobs as Bench (io codec, block
    // compress, reliable-checkpoint dir) so an isolated probe reproduces
    // the suite's execution conditions — at sf100 graph_pagerank's edge
    // pin OOMs without the reliable checkpoint path.
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_BLOCK_COMPRESS", "true"))
      .config("spark.checkpoint.compress",
        sys.env.getOrElse("SPARK_GRAFT_BLOCK_COMPRESS", "true"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.ui.enabled", "false")
      // same AQE advisory knob as Bench (see its comment): byte-targeted
      // coalescing is blind to reduce-side agg state
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.get("SPARK_GRAFT_ADVISORY_MB").map(_ + "m").getOrElse("64m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty)
      .foreach(d => spark.conf.set(graft.ops.Materialize.ConfKey, d))
    val acc = new ContainmentStages.Acc
    spark.sparkContext.addSparkListener(acc)
    def load(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // hypervisor steal + iowait jiffies (see Bench.cpuStat — this box is
    // a VM and bursty steal is the leading suspect for the r14/r15
    // unchanged-code wall swings the probe exists to explain). Guarded
    // via the shared ProcStat helper (r17 ADVICE item 3): on a host
    // without a readable /proc/stat the probe records the -1 sentinel
    // instead of throwing on its first query.
    def cpuStat(): Option[(Long, Long)] = ProcStat.stealIowait()
    val ncpus = Runtime.getRuntime.availableProcessors()
    val byName = graft.Queries.all.map(q => q.name -> q).toMap
    // one untimed warmup of the cheapest table so scan/JVM init isn't
    // charged to the first sample
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    names.foreach { name =>
      val q = byName.getOrElse(name,
        sys.error(s"IsoProbe: unknown query '$name'"))
      (1 to runs).foreach { i =>
        val l0 = load()
        val cpu0 = cpuStat()
        val before = acc.snap(0)
        val t0 = System.nanoTime()
        // same action switch as Bench (r17): noop (default) materializes
        // every output column — count() let Catalyst prune declared work
        // (see Bench.runAction); rows = -1 under noop
        // rows is a count-action-only field: under noop nothing is
        // counted, and reusing -1 would collide with the established
        // failure sentinel (r17 ADVICE item 4) — emit JSON null instead
        val n: Option[Long] =
          if (sys.env.get("SPARK_GRAFT_ACTION").contains("count"))
            Some(q.fn(spark, sfDir).count())
          else {
            q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            None
          }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu1 = cpuStat()
        val stealPct = ProcStat.pct(cpu0, cpu1, wall, ncpus, _._1)
        val iowaitPct = ProcStat.pct(cpu0, cpu1, wall, ncpus, _._2)
        val s0 = acc.snap(wall)
        val s = ContainmentStages.Snap(wall, s0.runSec - before.runSec,
          s0.gcSec - before.gcSec, s0.shufReadMB - before.shufReadMB,
          s0.shufWriteMB - before.shufWriteMB,
          s0.memSpillMB - before.memSpillMB,
          s0.diskSpillMB - before.diskSpillMB, s0.tasks - before.tasks)
        println(f"""{"query":"$name","run":$i,"rows":${n.getOrElse("null")},""" +
          f""""wall_sec":$wall%.2f,"exec_run_sec":${s.runSec}%.1f,""" +
          f""""gc_sec":${s.gcSec}%.1f,"shuffle_read_mb":${s.shufReadMB}%.0f,""" +
          f""""shuffle_write_mb":${s.shufWriteMB}%.0f,""" +
          f""""mem_spill_mb":${s.memSpillMB}%.0f,""" +
          f""""disk_spill_mb":${s.diskSpillMB}%.0f,""" +
          f""""steal_pct":$stealPct%.1f,"iowait_pct":$iowaitPct%.1f,""" +
          f""""load_before":$l0%.2f,"load_after":${load()}%.2f}""")
      }
    }
    spark.stop()
  }
}
