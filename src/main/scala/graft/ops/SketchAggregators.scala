package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass sketch signatures as typed `Aggregator`s (SURVEY §2.10).
  *
  * The relational formulations in [[Dedup]] explode each hashed token by
  * the permutation/bit index — a 64× row blowup through the first
  * aggregate. These aggregators keep the whole signature in ONE mutable
  * buffer per group: each input row updates all 64 slots in a tight JIT'd
  * loop, partial aggregation (map-side combine) still applies because min
  * and sum are commutative monoids, and merge is elementwise. Same
  * signatures, ~1/64th of the rows through the shuffle machinery.
  *
  * At cluster scale this is the shape that matters: the shuffle carries
  * one 64-long buffer per (doc, partition) instead of 64 rows per doc,
  * and the update loop never leaves the JVM.
  */
object SketchAggregators {

  case class HashPair(h1: Long, h2: Long)
  case class LongBuf(var m: Array[Long])

  private val longBufEnc: Encoder[LongBuf] = Encoders.product[LongBuf]
  private val sigEnc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** MinHash minima: slot i holds min over shingles of (h1 + i·h2).
    * Identical values to `MIN(h1 + i*h2) GROUP BY doc, i` — inputs are
    * already reduced mod 2³¹−1 so h1 + 63·h2 < 2³⁷ (no ANSI overflow). */
  def minhash(perms: Int): Aggregator[HashPair, LongBuf, Seq[Long]] =
    new Aggregator[HashPair, LongBuf, Seq[Long]] {
      def zero: LongBuf = LongBuf(Array.fill(perms)(Long.MaxValue))
      def reduce(b: LongBuf, v: HashPair): LongBuf = {
        val m = b.m
        var i = 0
        while (i < perms) {
          val h = v.h1 + i * v.h2
          if (h < m(i)) m(i) = h
          i += 1
        }
        b
      }
      def merge(a: LongBuf, b: LongBuf): LongBuf = {
        val ma = a.m; val mb = b.m
        var i = 0
        while (i < perms) {
          if (mb(i) < ma(i)) ma(i) = mb(i)
          i += 1
        }
        a
      }
      def finish(b: LongBuf): Seq[Long] = b.m.toSeq
      def bufferEncoder: Encoder[LongBuf] = longBufEnc
      def outputEncoder: Encoder[Seq[Long]] = sigEnc
    }

  /** SimHash bit sums → signature: slot i accumulates ±1 per token hash
    * bit i; finish sets bit i iff the sum is positive. Identical values to
    * the two-level relational form in [[Dedup.simhashSignatures]]. */
  def simhash(nBits: Int): Aggregator[Long, LongBuf, Long] =
    new Aggregator[Long, LongBuf, Long] {
      def zero: LongBuf = LongBuf(new Array[Long](nBits))
      def reduce(b: LongBuf, h: Long): LongBuf = {
        val m = b.m
        var i = 0
        while (i < nBits) {
          m(i) += ((h >> i) & 1L) * 2 - 1
          i += 1
        }
        b
      }
      def merge(a: LongBuf, b: LongBuf): LongBuf = {
        val ma = a.m; val mb = b.m
        var i = 0
        while (i < nBits) {
          ma(i) += mb(i)
          i += 1
        }
        a
      }
      def finish(b: LongBuf): Long = {
        var sig = 0L
        var i = 0
        while (i < nBits) {
          if (b.m(i) > 0) sig |= 1L << i
          i += 1
        }
        sig
      }
      def bufferEncoder: Encoder[LongBuf] = longBufEnc
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** KMV (k-minimum-values) distinct sketch: the k smallest DISTINCT
    * hash values seen. Buffer is a sorted ascending array of ≤ k longs —
    * a full buffer rejects most inputs with one comparison against the
    * current max; insertion is binary-search + arraycopy (O(log k + k),
    * k is small). Merge = sorted-merge, distinct, truncate to k — the
    * k smallest of A ∪ B all lie inside kmin(A) ∪ kmin(B), so merged
    * sketches equal the sketch of the union (what makes KMV mergeable
    * across partitions, partial aggregation included).
    *
    * Unlike HLL the result is a deterministic FUNCTION of the value set
    * under a fixed hash — with the portable 60-bit md5 hash
    * ([[Dedup.md5Long]]) any engine replays the sketch bit-for-bit,
    * so KMV estimates can be value-checked cross-engine, not just
    * bound-checked (the q33 compromise HLL forces). */
  def kmv(k: Int): Aggregator[Long, LongBuf, Seq[Long]] =
    new Aggregator[Long, LongBuf, Seq[Long]] {
      def zero: LongBuf = LongBuf(Array.empty[Long])
      def reduce(b: LongBuf, h: Long): LongBuf = {
        val v = b.m
        val n = v.length
        if (n == k && h >= v(n - 1)) return b // common case: one compare
        val i = java.util.Arrays.binarySearch(v, h)
        if (i >= 0) return b // already present
        val ins = -i - 1
        val grown = if (n < k) new Array[Long](n + 1) else new Array[Long](k)
        System.arraycopy(v, 0, grown, 0, ins)
        grown(ins) = h
        System.arraycopy(v, ins, grown, ins + 1,
          math.min(n, grown.length - 1) - ins)
        b.m = grown
        b
      }
      def merge(a: LongBuf, b: LongBuf): LongBuf = {
        val out = new Array[Long](math.min(k, a.m.length + b.m.length))
        var i = 0; var j = 0; var n = 0
        var last = Long.MinValue
        var first = true
        while (n < out.length && (i < a.m.length || j < b.m.length)) {
          val next =
            if (j >= b.m.length || (i < a.m.length && a.m(i) <= b.m(j))) {
              val x = a.m(i); i += 1; x
            } else { val x = b.m(j); j += 1; x }
          if (first || next != last) { out(n) = next; n = n + 1; first = false }
          last = next
        }
        a.m = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
        a
      }
      def finish(b: LongBuf): Seq[Long] = b.m.toSeq
      def bufferEncoder: Encoder[LongBuf] = longBufEnc
      def outputEncoder: Encoder[Seq[Long]] = sigEnc
    }
}
