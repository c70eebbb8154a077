package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import scala.jdk.CollectionConverters._

/** Versioned, keyed state table — the scale path for the reference's
  * run-over-run state (`pipeline_state/last_run.jsonl`, one record) when
  * the key space is large (millions of (sorteo, fecha)-like keys).
  *
  * Layout: `root/v=N/__graft_bucket=H/` parquet snapshots, bucketed by a
  * stable hash of the key columns, plus an atomically-swapped `_VERSION`
  * pointer (temp+rename, like the reference's truncate-write but
  * crash-safe): readers always see a complete snapshot, a failed upsert
  * leaves the previous version intact.
  *
  * Upsert is bucket-incremental: only buckets that contain an updated key
  * are read, anti-joined, and rewritten; every untouched bucket is
  * HARD-LINKED from the previous version (a metadata-only operation — the
  * object-storage analog is copying manifest entries). Write
  * amplification per upsert is therefore O(touched buckets / numBuckets ×
  * corpus), not O(corpus): at 100 TB state with 1024 buckets, a batch
  * touching 3 buckets rewrites ~0.3% of the snapshot. The bucket count is
  * persisted in `_BUCKETS` at first write so later upserts can never
  * silently re-bucket (bucket assignment must be stable across versions).
  * Old versions are pruned after the pointer moves; pruning unlinks, so
  * files still referenced by newer versions' hard links survive.
  */
object StateTable {

  /** Internal bucket partition column — collision-proofed name so an
    * upsert can never clobber a caller column. */
  private val B = "__graft_bucket"

  private def pointer(root: String) = Paths.get(root, "_VERSION")
  private def bucketsMeta(root: String) = Paths.get(root, "_BUCKETS")

  /** Files.list/walk streams hold an open directory fd until closed; a
    * long-running streaming driver upserting every micro-batch would
    * otherwise leak fds until "too many open files". */
  private def listDir[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator().asScala) finally s.close()
  }
  private def walkDir[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(p)
    try f(s.iterator().asScala) finally s.close()
  }

  def latestVersion(root: String): Option[Long] = {
    val p = pointer(root)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Latest committed snapshot, if any (bucket column stripped). */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    latestVersion(root).map(v => spark.read.parquet(s"$root/v=$v").drop(B))

  /** Upsert `updates` by `keyCols`: new rows win over current state rows
    * with the same key. Returns the committed version. `numBuckets` only
    * applies to the table's first write; it is persisted and reused for
    * every later version. */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
      keyCols: Seq[String], keepVersions: Int = 3, numBuckets: Int = 16): Long = {
    val nb =
      if (Files.exists(bucketsMeta(root))) Files.readString(bucketsMeta(root)).trim.toInt
      else numBuckets
    val cur = latestVersion(root)
    val next = cur.getOrElse(-1L) + 1
    // Murmur3 over the key columns — deterministic, partition-independent,
    // so a key lands in the same bucket in every version
    val bucketOf = pmod(hash(keyCols.map(col): _*), lit(nb))
    val updB = updates.withColumn(B, bucketOf)
    val touched = updB.select(B).distinct().collect().map(_.getInt(0)).toSet
    // a snapshot written by the pre-bucketed layout has parquet files at
    // the version root instead of bucket dirs; treating it as "no touched
    // buckets" would silently DROP the whole corpus state — migrate it
    // by merging the full flat snapshot instead
    val flatLegacy = cur.exists(v => listDir(Paths.get(root, s"v=$v"))(
      _.exists(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))))
    val mergedTouched = cur match {
      case None => updB
      case Some(v) if flatLegacy =>
        spark.read.parquet(s"$root/v=$v").drop(B)
          .join(updates.select(keyCols.map(col): _*).dropDuplicates(keyCols),
            keyCols, "left_anti")
          .withColumn(B, bucketOf)
          .unionByName(updB)
      case Some(v) =>
        val touchedPaths = touched.toSeq.sorted
          .map(b => Paths.get(root, s"v=$v", s"$B=$b"))
          .filter(Files.exists(_)).map(_.toString)
        if (touchedPaths.isEmpty) updB
        else spark.read.option("basePath", s"$root/v=$v").parquet(touchedPaths: _*)
          .join(updates.select(keyCols.map(col): _*).dropDuplicates(keyCols),
            keyCols, "left_anti")
          .unionByName(updB)
    }
    // one shuffle on the bucket id → exactly one file per touched bucket
    val nextDir = Paths.get(root, s"v=$next")
    mergedTouched.repartition(col(B))
      .write.mode("overwrite").partitionBy(B).parquet(nextDir.toString)
    // untouched buckets: hard-link the previous version's files (no IO)
    cur.foreach { v =>
      listDir(Paths.get(root, s"v=$v"))(_
        .filter(p => p.getFileName.toString.startsWith(s"$B="))
        .filter(p => !touched.contains(p.getFileName.toString.drop(B.length + 1).toInt))
        .foreach(src => linkTree(src, nextDir.resolve(src.getFileName.toString))))
    }
    if (!Files.exists(bucketsMeta(root))) Files.writeString(bucketsMeta(root), nb.toString)
    // atomic pointer swap, then prune behind the retention window
    val tmp = pointer(root).resolveSibling("_VERSION.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(root), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    prune(root, next, keepVersions)
    next
  }

  /** Delete by key — the compliance path (right-to-be-forgotten rows
    * must leave the STATE, not just the corpus, or re-ingested content
    * keeps matching ghosts). Bucket-incremental like [[upsert]]: only
    * buckets containing a doomed key are read, anti-joined, and
    * rewritten; untouched buckets hard-link. Returns the committed
    * version, or the current one unchanged when there is no state or no
    * keys. A bucket whose rows are all deleted simply has no dir in the
    * new version (readers of a fully-emptied table must expect a
    * dataless snapshot). */
  def delete(spark: SparkSession, root: String, keys: DataFrame,
      keyCols: Seq[String], keepVersions: Int = 3): Long = {
    val cur = latestVersion(root)
    if (cur.isEmpty) return -1L
    val v = cur.get
    val nb = if (Files.exists(bucketsMeta(root)))
      Files.readString(bucketsMeta(root)).trim.toInt else 16
    val bucketOf = pmod(hash(keyCols.map(col): _*), lit(nb))
    val doomed = keys.select(keyCols.map(col): _*).dropDuplicates(keyCols)
      .withColumn(B, bucketOf)
    val touched = doomed.select(B).distinct().collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return v
    val next = v + 1
    // same flat-legacy escape as upsert: a pre-bucketed snapshot is
    // migrated with one full rewrite instead of a bucket-path read
    val flatLegacy = listDir(Paths.get(root, s"v=$v"))(
      _.exists(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet")))
    val touchedPaths =
      if (flatLegacy) Seq(s"$root/v=$v")
      else touched.toSeq.sorted
        .map(b => Paths.get(root, s"v=$v", s"$B=$b"))
        .filter(Files.exists(_)).map(_.toString)
    val nextDir = Paths.get(root, s"v=$next")
    if (touchedPaths.nonEmpty) {
      val prior =
        if (flatLegacy) spark.read.parquet(touchedPaths.head).drop(B)
          .withColumn(B, bucketOf)
        else spark.read.option("basePath", s"$root/v=$v").parquet(touchedPaths: _*)
      prior.join(doomed.drop(B), keyCols, "left_anti")
        .repartition(col(B))
        .write.mode("overwrite").partitionBy(B).parquet(nextDir.toString)
    } else Files.createDirectories(nextDir)
    if (!flatLegacy)
      listDir(Paths.get(root, s"v=$v"))(_
        .filter(p => p.getFileName.toString.startsWith(s"$B="))
        .filter(p => !touched.contains(p.getFileName.toString.drop(B.length + 1).toInt))
        .foreach(src => linkTree(src, nextDir.resolve(src.getFileName.toString))))
    if (!Files.exists(bucketsMeta(root))) Files.writeString(bucketsMeta(root), nb.toString)
    val tmp = pointer(root).resolveSibling("_VERSION.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(root), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    prune(root, next, keepVersions)
    next
  }

  /** Hard-link every regular file of a bucket dir into the new version. */
  private def linkTree(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    listDir(src)(_.filter(Files.isRegularFile(_))
      .foreach(f => Files.createLink(dst.resolve(f.getFileName.toString), f)))
  }

  private def prune(root: String, latest: Long, keep: Int): Unit = {
    val dir = Paths.get(root)
    if (!Files.exists(dir)) return
    listDir(dir)(_
      .filter(p => p.getFileName.toString.startsWith("v="))
      .filter(p => p.getFileName.toString.drop(2).toLong <= latest - keep)
      .toSeq).foreach { p =>
        walkDir(p)(_.toSeq).reverse.foreach(Files.deleteIfExists(_))
      }
  }
}
