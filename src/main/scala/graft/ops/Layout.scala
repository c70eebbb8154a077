package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout management — the write-side half of scan performance.
  *
  * At 100 TB the fastest query is the one that never reads most of the
  * data; that is decided when the data is WRITTEN:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning on a
  *    low-cardinality column ⇒ partition pruning (the scan's
  *    `PartitionFilters`) skips whole directories.
  *  - [[writeClustered]]: repartition on a key + sort within partitions ⇒
  *    parquet row-group min/max stats become selective, point/range
  *    predicates skip row groups, and downstream joins on the cluster key
  *    see pre-sorted runs. File count is explicit — small-file storms are
  *    a layout bug, not a tuning knob.
  *  - [[zorder2]]: bit-interleaving of two normalized dimensions ⇒ one
  *    sort order that preserves locality in BOTH dimensions, for tables
  *    queried by either/both (the classic lakehouse OPTIMIZE ZORDER BY).
  */
object Layout {

  /** Hive-style partitioned parquet write. Caller picks partition columns
    * with few distinct values (lang, date, source) — each becomes a
    * directory level the planner can prune without touching data. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    sorted.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)
  }

  /** Clustered write: `files` output files, co-partitioned and sorted by
    * `keys`. Row-group stats on the sort key turn range predicates into
    * row-group skips at read time. */
  def writeClustered(df: DataFrame, path: String, keys: Seq[String],
      files: Int): Unit =
    df.repartition(files, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory into files of
    * ≈`targetFileBytes`. The output file count derives from the MEASURED
    * input bytes, not a guessed repartition number — the small-file
    * storm every long-running ingest loop produces (one file per
    * micro-batch per bucket) is a layout bug this repairs on a schedule.
    * An optional sort re-clusters while compacting (row-group stats stay
    * selective). The rewrite lands in a sibling temp dir and swaps in
    * via two renames, so a crash leaves either the old or the new
    * layout, never a half-written mix. Returns the output file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): Int = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    def walkSeq(p: Path): Seq[Path] = {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    def rmTree(p: Path): Unit =
      if (Files.exists(p)) walkSeq(p).reverse.foreach(Files.deleteIfExists(_))
    val tmp = Paths.get(path.stripSuffix("/") + ".__graft_compact")
    val old = Paths.get(path.stripSuffix("/") + ".__graft_old")
    val target = Paths.get(path)
    // crash recovery: a previous run that died between the two renames
    // left the data under .__graft_old and nothing at `path` — restore
    // it; any stale tmp/old leftovers are then safe to clear
    if (!Files.exists(target) && Files.exists(old)) Files.move(old, target)
    rmTree(tmp); rmTree(old)
    val bytes = walkSeq(target)
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(Files.size).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val out =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartition(nFiles).sortWithinPartitions(sortCols.map(col): _*)
    out.write.mode("overwrite").parquet(tmp.toString)
    Files.move(target, old)
    Files.move(tmp, target)
    rmTree(old)
    nFiles
  }

  /** 2-D Z-order (Morton) key: interleaves the low `bitsPerDim` bits of
    * two non-negative long columns — bit i of `a` lands at 2i, bit i of
    * `b` at 2i+1. Pure shift/or expression tree, codegen-friendly.
    * Normalize each dimension to [0, 2^bitsPerDim) first (e.g. rank or
    * scaled min-max) — Z-order on raw skewed values clusters poorly. */
  def zorder2(a: Column, b: Column, bitsPerDim: Int = 16): Column = {
    require(bitsPerDim >= 1 && bitsPerDim <= 31, "bitsPerDim in [1,31]")
    (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-order-clustered parquet write: min–max scale both columns to
    * [0, 2^bits) (two driver scalars per column — one agg), range-
    * partition by the Morton key into `numFiles` files and sort within
    * each, so every file covers a small RECTANGLE of the (a, b) space
    * instead of a stripe. Parquet min/max footer stats then prune
    * predicates on EITHER column to ~√files of the data — a sort by one
    * column gives perfect pruning on it and none on the other. That's
    * the whole trade and the reason this is the multi-dimensional layout
    * default at 100 TB. */
  def zorderWrite(df: DataFrame, path: String, aCol: String, bCol: String,
      numFiles: Int = 16, bitsPerDim: Int = 16): Unit = {
    val s = df.agg(
      min(col(aCol).cast("double")).as("amin"), max(col(aCol).cast("double")).as("amax"),
      min(col(bCol).cast("double")).as("bmin"), max(col(bCol).cast("double")).as("bmax"))
      .collect().head
    val top = (1L << bitsPerDim) - 1
    def scaled(c: String, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      else least(lit(top), greatest(lit(0L),
        ((col(c).cast("double") - lo) / (hi - lo) * top).cast("long")))
    val z = zorder2(scaled(aCol, s.getDouble(0), s.getDouble(1)),
      scaled(bCol, s.getDouble(2), s.getDouble(3)), bitsPerDim)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
