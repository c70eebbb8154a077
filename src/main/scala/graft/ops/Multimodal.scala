package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media ride through the engine as opaque `binary` columns with typed
  * metadata; decode/feature-extract runs batched inside `mapPartitions`
  * (one codec instance per partition, amortized init — the Scala analog
  * of a batched pandas UDF). The actual codec is behind [[MediaCodec]]:
  * this container has no image/audio libraries, so the default impl is a
  * clearly-marked deterministic fake — the Spark-side plumbing (schema,
  * partitioning, batch shape, null-safety) is real and tested, and a real
  * JNI/JavaCV codec drops in without touching the plan.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, ok: Boolean,
      features: Array[Float], frames: Int)

  /** Batched decode/feature-extract boundary. One instance per partition. */
  trait MediaCodec extends Serializable {
    /** Decode + featurize one blob; None = undecodable (kept, flagged). */
    def features(kind: String, bytes: Array[Byte], meta: MediaMeta): Option[Array[Float]]
    /** How many frames/samples the blob yields for frame-level ops. */
    def frameCount(meta: MediaMeta): Int
    /** Re-encode the blob at (w, h); None = undecodable. */
    def resize(kind: String, bytes: Array[Byte], meta: MediaMeta,
        w: Int, h: Int): Option[(Array[Byte], MediaMeta)]
  }

  /** STUB codec — deterministic fake standing in for a real decoder
    * (no media libraries in this environment). Features are a seeded hash
    * fold of the bytes: stable across runs/partitions/cluster sizes. */
  final class StubCodec(dim: Int = 8) extends MediaCodec {
    def features(kind: String, bytes: Array[Byte], meta: MediaMeta): Option[Array[Float]] = {
      if (bytes == null || bytes.isEmpty) return None
      val out = new Array[Float](dim)
      var h = 1125899906842597L // FNV-ish seed
      var i = 0
      while (i < bytes.length) {
        h = h * 31 + bytes(i); i += 1
        out(i % dim) += (h % 1000) / 1000.0f
      }
      Some(out.map(v => v / bytes.length))
    }
    def frameCount(meta: MediaMeta): Int =
      if (meta.durationMs <= 0) 1 else (meta.durationMs / 1000L).toInt.max(1)
    /** Fake resize: deterministic byte resample to w·h "pixels" (truncate
      * or cycle-pad), meta updated — a real codec re-encodes instead. */
    def resize(kind: String, bytes: Array[Byte], meta: MediaMeta,
        w: Int, h: Int): Option[(Array[Byte], MediaMeta)] = {
      if (bytes == null || bytes.isEmpty) return None
      val out = Array.tabulate(w * h)(i => bytes(i % bytes.length))
      Some((out, meta.copy(width = w, height = h)))
    }
  }

  /** Batched feature extraction: repartition for even work distribution,
    * then one codec per partition. At 100 TB the repartition count is the
    * only knob — no driver involvement, no per-row codec init. */
  def extractFeatures(media: Dataset[MediaRow], codec: MediaCodec,
      partitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val balanced = if (partitions > 0) media.repartition(partitions) else media
    balanced.mapPartitions { rows =>
      rows.map { r =>
        codec.features(r.kind, r.bytes, r.meta) match {
          case Some(f) => MediaFeatures(r.media_id, r.kind, ok = true, f,
            codec.frameCount(r.meta))
          case None => MediaFeatures(r.media_id, r.kind, ok = false,
            Array.empty[Float], 0)
        }
      }
    }
  }

  /** Batched resize: binary → binary with updated meta, same schema out
    * as in (a media table maps to a media table, so resize stages chain
    * with any other media op). Undecodable blobs pass through unchanged
    * rather than erroring the partition — at 100 TB a corrupt blob is
    * data, not an exception. */
  def resizeAll(media: Dataset[MediaRow], codec: MediaCodec,
      w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        codec.resize(r.kind, r.bytes, r.meta, w, h) match {
          case Some((b2, m2)) => r.copy(bytes = b2, meta = m2)
          case None => r
        }
      }
    }
  }

  /** Frame sampling as a relational op: one output row per sampled frame
    * index (explode of a bounded sequence — no codec needed for planning
    * frame-level work). */
  def sampleFrames(media: Dataset[MediaRow], codec: MediaCodec,
      everyNth: Int = 1): DataFrame = {
    import media.sparkSession.implicits._
    media.map(r => (r.media_id, r.kind, codec.frameCount(r.meta)))
      .toDF("media_id", "kind", "n_frames")
      .select(col("media_id"), col("kind"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % everyNth === 0)
  }

  /** Perceptual hash per media row: resize to a `side`×`side` thumbnail
    * THROUGH the codec (the honest multimodal path — swap in a real
    * codec and nothing else changes), then one bit per pixel:
    * 1 iff pixel > thumbnail mean. Near-identical media differ in few
    * bits — the hamming-ball neighbourhood [[phashPairs]] searches.
    * Imperative per-row work stays in `mapPartitions`; everything after
    * the hash is relational.
    *
    * `side = 8` (64-bit hash) is a SCALE floor, not a quality knob: the
    * pigeonhole join buckets on hash chunks, so chunk width must keep
    * expected bucket occupancy O(near-dup cluster size). The original
    * 4×4 default (16-bit hash, 8-bit chunks = 256 buckets) went
    * quadratic the moment the corpus outgrew the key space — measured
    * 0.6 s → 29.6 s for 10× data at sf1. 32-bit chunks defer that wall
    * by a factor of 2³² ∕ 2⁸. */
  def perceptualHash(media: Dataset[MediaRow], codec: MediaCodec,
      side: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    resizeAll(media, codec, side, side).map { r =>
      val px = r.bytes.map(b => (b & 0xff).toDouble)
      val mean = px.sum / px.length
      var h = 0L
      px.zipWithIndex.foreach { case (p, i) => if (p > mean) h |= 1L << i }
      (r.media_id, r.kind, h)
    }.toDF("media_id", "kind", "phash")
  }

  /** Near-duplicate media pairs within hamming distance `r` of the
    * `bits`-bit perceptual hash, by chunk pigeonhole (the SimHash join
    * shape): split the hash into r+1 chunks — any pair within distance r
    * agrees on ≥ 1 whole chunk — equi-join per (chunk index, value)
    * bucket, then verify exact `bit_count(xor)`. Never an all-pairs
    * product; candidate volume is bounded by bucket occupancy, and the
    * explode adds r+1 rows per media, not per pair.
    *
    * `maxBucket`: same hot-bucket escape hatch as
    * [[Dedup.minhashCandidates]] — drop (chunk, value) buckets holding
    * more than this many media before the self-join. A degenerate hash
    * (whole-corpus black frames, one corrupt-decode byte pattern)
    * otherwise goes quadratic in one task; media in an overflowing
    * bucket still pair through the other r chunks. Default None keeps
    * exact declared-query semantics. */
  def phashPairs(hashes: DataFrame, bits: Int = 64, r: Int = 1,
      maxBucket: Option[Int] = None): DataFrame = {
    val chunks = r + 1
    val width = bits / chunks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val keyedAll = hashes.select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(chunks - 1))).as("ci"))
      .withColumn("ck", expr(s"shiftright(phash, ci * $width)")
        .bitwiseAND(lit(mask)))
    val keyed = maxBucket match {
      case None => keyedAll
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window.partitionBy("ci", "ck")
        keyedAll.withColumn("__bn", count(lit(1)).over(w))
          .filter(col("__bn") <= cap).drop("__bn")
    }
    keyed.select(col("ci"), col("ck"), col("media_id").as("media_a"),
        col("phash").as("ph_a"))
      .join(keyed.select(col("ci"), col("ck"), col("media_id").as("media_b"),
        col("phash").as("ph_b")), Seq("ci", "ck"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= r)
  }

  /** Build a synthetic media table from any text corpus (UTF-8 bytes as
    * blobs) — lets the plumbing be exercised against driver test data.
    * Audio durations vary by id (500 + (id mod 6)·1000 ms ⇒ frameCount
    * max(1, id mod 6)) so frame-level ops exercise ragged frame counts. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, if (id % 2 == 0) "image" else "audio",
          text.getBytes("UTF-8"),
          MediaMeta(if (id % 2 == 0) "png" else "wav",
            (id % 64).toInt + 1, 32,
            if (id % 2 == 0) 0L else 500L + (id % 6) * 1000L))
      }
  }
}
