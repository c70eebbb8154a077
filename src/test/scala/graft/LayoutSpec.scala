package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Write-side layout: partition pruning, clustered sort, z-order. */
class LayoutSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("partitioned write prunes directories at read time") {
    val path = tmp()
    Layout.writePartitioned(
      Tables.documents(spark, sf("sf0.001")), path,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
    val read = spark.read.parquet(path).filter(col("lang") === "en")
    val expected = Tables.documents(spark, sf("sf0.001"))
      .filter(col("lang") === "en").count()
    // collect() drives read's own queryExecution — its scan metrics below
    // reflect this exact run (count() would build a separate plan)
    assert(read.collect().length == expected)
    // the executed scan must have touched only the lang=en directory:
    // 1 of the 5 lang partitions (partition pruning, not a data filter)
    val scans = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.metrics("numFiles").value == 1,
      scans.head.metrics("numFiles").value.toString)
    val planStr = read.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("lang"),
      planStr.take(1500))
  }

  test("star join prunes fact partitions at RUNTIME from the dim filter (DPP)") {
    import spark.implicits._
    val path = tmp()
    Layout.writePartitioned(
      Tables.documents(spark, sf("sf0.001")), path, partitionCols = Seq("lang"))
    val fact = spark.read.parquet(path)
    // dim: lang → group; the filter selects a group, not a lang — so at
    // PLAN time no literal predicate exists on the partition column, and
    // only dynamic partition pruning (subquery reusing the broadcast) can
    // skip fact directories. This is the 100 TB star-join shape: the date
    // dim's WHERE clause must prune the partitioned fact's directories.
    // The dim must be a FILE relation: an in-memory Seq constant-folds to
    // a LocalRelation, which PartitionPruning rejects (no scan-side
    // selective predicate to justify the subquery).
    val dimPath = tmp()
    Seq(("en", "west"), ("de", "west"), ("fr", "east"),
      ("es", "east"), ("zh", "east")).toDF("d_lang", "grp")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact
      .join(broadcast(dim.filter($"grp" === "west")), $"lang" === $"d_lang")
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val rows = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("en" -> 193L, "de" -> 71L), rows.toString)
    // the join+agg plan is adaptive AND staged: collect() stops at both
    // AdaptiveSparkPlanExec and materialized QueryStageExec boundaries, so
    // walk through them explicitly to reach the fact-side file scan
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case _ => Nil
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case other => other.children
      }
      here ++ kids.flatMap(scans)
    }
    val scan = scans(joined.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains(path)))
      .head
    assert(scan.partitionFilters.exists(
        _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]).isDefined),
      s"expected a dynamicpruning partition filter: ${scan.partitionFilters}")
    // runtime effect: only the 2 'west' lang directories were read (of 5)
    assert(scan.metrics("numFiles").value == 2,
      s"numFiles=${scan.metrics("numFiles").value}")
  }

  test("clustered write yields the requested file count, sorted runs") {
    val path = tmp()
    Layout.writeClustered(
      Tables.documents(spark, sf("sf0.001")).select("doc_id", "text"),
      path, keys = Seq("doc_id"), files = 4)
    val files = spark.read.parquet(path).inputFiles
    assert(files.length == 4, files.length)
    // each file internally sorted by the cluster key (row-group stats usable)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"unsorted file $f")
    }
  }

  test("compact: small-file storm collapses, data identical, dir swapped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("t").toString
    // 64 tiny files — the micro-batch small-file storm
    (0L until 2000L).map(i => (i, s"row_$i")).toDF("id", "v")
      .repartition(64).write.parquet(dir)
    import scala.jdk.CollectionConverters._
    def parquetCount() = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    assert(parquetCount() == 64)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    val n = graft.ops.Layout.compact(spark, dir,
      targetFileBytes = 1L * 1024 * 1024, sortCols = Seq("id"))
    assert(n == 1 && parquetCount() == 1, s"got $n files, ${parquetCount()} on disk")
    val after = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(after == before)
    // no leftover temp/old dirs
    val parent = java.nio.file.Paths.get(dir).getParent
    val siblings = java.nio.file.Files.list(parent).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(siblings == Set("t"), s"leftovers: $siblings")
  }

  test("compact: recovers from a crash between the two renames") {
    import spark.implicits._
    val parent = java.nio.file.Files.createTempDirectory("graft-compact-crash")
    val dir = parent.resolve("t").toString
    (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    // simulate the crash window: data moved to .__graft_old, nothing at path
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".__graft_old"))
    val n = graft.ops.Layout.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(n == 1)
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before,
      "crash recovery must restore and compact the old data")
    import scala.jdk.CollectionConverters._
    val siblings = java.nio.file.Files.list(parent).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(siblings == Set("t"), s"leftovers after recovery: $siblings")
  }

  test("zorder2 interleaves bits and preserves 2-D locality") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (3L, 3L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y"), 4).as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)  // x bit0 → z bit0
    assert(got((0L, 1L)) == 2L)  // y bit0 → z bit1
    assert(got((1L, 1L)) == 3L)
    assert(got((2L, 0L)) == 4L)  // x bit1 → z bit2
    assert(got((3L, 3L)) == 15L)
    // locality: z-sorting a 16x16 grid keeps both dims bounded within any
    // contiguous 64-cell chunk (row-major sort would span the full y range)
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y"), 4).as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1)))
    grid.grouped(64).foreach { chunk =>
      val (xs, ys) = chunk.unzip
      assert(xs.max - xs.min <= 7 && ys.max - ys.min <= 7,
        s"chunk spans x=${xs.min}..${xs.max} y=${ys.min}..${ys.max}")
    }
  }

  test("zorderWrite: file stats prune BOTH dimensions; x-sort prunes only x") {
    import spark.implicits._
    val df = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft-lin").toString
    Layout.zorderWrite(df, zDir, "x", "y", numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    // per-FILE min/max of y — what parquet footer pruning sees
    def filesCoveringY(dir: String, y0: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("y").as("lo"), max("y").as("hi"))
        .filter(col("lo") <= y0 && col("hi") >= y0)
        .count()
    val zFiles = filesCoveringY(zDir, 10L)
    val linFiles = filesCoveringY(linDir, 10L)
    assert(zFiles <= 6, s"z-order should confine y=10 to ~sqrt(files): $zFiles")
    assert(linFiles >= 15, s"x-sorted files all span the y range: $linFiles")
    // and the layout loses no rows
    assert(spark.read.parquet(zDir).count() == 64L * 64L)
  }
}
