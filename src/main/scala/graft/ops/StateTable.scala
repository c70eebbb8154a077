package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Versioned, keyed state table — the scale path for the reference's
  * run-over-run state (`pipeline_state/last_run.jsonl`, one record) when
  * the key space is large (millions of (sorteo, fecha)-like keys).
  *
  * Layout: `root/v=N/` parquet snapshots + an atomically-swapped
  * `_VERSION` pointer (temp+rename, like the reference's truncate-write
  * but crash-safe): readers always see a complete snapshot, a failed
  * upsert leaves the previous version intact. Upsert = anti-join out the
  * updated keys + union the new rows — one shuffle on the key columns;
  * old versions are pruned after the pointer moves (small retention
  * window for concurrent readers).
  */
object StateTable {

  private def pointer(root: String) = Paths.get(root, "_VERSION")

  def latestVersion(root: String): Option[Long] = {
    val p = pointer(root)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Latest committed snapshot, if any. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    latestVersion(root).map(v => spark.read.parquet(s"$root/v=$v"))

  /** Upsert `updates` by `keyCols`: new rows win over current state rows
    * with the same key. Returns the committed version. */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
      keyCols: Seq[String], keepVersions: Int = 3): Long = {
    val next = latestVersion(root).getOrElse(-1L) + 1
    val merged = read(spark, root) match {
      case None => updates
      case Some(current) =>
        current.join(updates.select(keyCols.map(org.apache.spark.sql.functions.col): _*)
            .dropDuplicates(keyCols),
          keyCols, "left_anti")
          .unionByName(updates)
    }
    merged.write.mode("overwrite").parquet(s"$root/v=$next")
    // atomic pointer swap, then prune behind the retention window
    val tmp = pointer(root).resolveSibling("_VERSION.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(root), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    prune(root, next, keepVersions)
    next
  }

  private def prune(root: String, latest: Long, keep: Int): Unit = {
    val dir = Paths.get(root)
    if (!Files.exists(dir)) return
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("v="))
      .filter(p => p.getFileName.toString.drop(2).toLong <= latest - keep)
      .foreach { p =>
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      }
  }
}
