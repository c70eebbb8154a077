package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches and their set algebra
  * (SURVEY §2.4 sketch row, beyond the HLL in q33).
  *
  * KMV (k-minimum-values): keep the k smallest distinct hash values of a
  * set; with the hash uniform on [0, 2⁶⁰), the k-th smallest value h₍ₖ₎
  * estimates the distinct count as (k−1)·2⁶⁰ / h₍ₖ₎, and below k values
  * the sketch IS the exact distinct set. Sketches merge losslessly
  * (k-min of A ∪ B ⊆ kmin(A) ∪ kmin(B)), which gives union estimates for
  * free and intersections by inclusion–exclusion — the set-operation
  * algebra HLL only supports via union.
  *
  * Scale shape: one partial-aggregated pass ([[SketchAggregators.kmv]] —
  * the shuffle carries ≤ k longs per group, not the value set), and all
  * set algebra afterwards runs on k-length arrays with native array
  * expressions. Deterministic: the portable 60-bit md5 hash makes every
  * estimate an exact cross-engine value, not a bound check.
  */
object Sketches {

  /** Portable hash a value into KMV space: 60-bit md5 ([[Dedup.md5Long]]
    * of the string form — any engine with md5 reproduces it). */
  def kmvHash(c: Column): Column = Dedup.md5Long(c.cast("string"))

  /** KMV sketches per group: `groupCols` → sketch of distinct
    * `valueCol`s (sorted ascending array of ≤ k hash longs). */
  def kmvPerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val agg = udaf(SketchAggregators.kmv(k),
      org.apache.spark.sql.Encoders.scalaLong)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(kmvHash(col(valueCol))).as("kmv"))
  }

  /** Merged sketch of two sketches ≡ the sketch of the union of the
    * underlying sets (native array ops on ≤ 2k elements). */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate from a sketch: exact size below k (the
    * sketch holds the whole set), else (k−1)·2⁶⁰ / h₍ₖ₎, rounded to 4
    * places so downstream inclusion–exclusion is reproducible from the
    * published estimates alone. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, round(size(sketch).cast("double"), 4))
      .otherwise(round(
        lit((k - 1).toDouble) * pow(lit(2.0), lit(60)) / element_at(sketch, k), 4))

  /** Count–min heavy hitters: exact top-k values of `valueCol` (by
    * frequency, value tiebreak) side-by-side with their CMS estimates
    * and the sketch's accuracy contract (true ≤ est ≤ true + ε·N, w.p.
    * 1−δ). The sketch is THE bounded-memory path for frequency queries
    * over unbounded vocabularies: depth×width integer counters
    * regardless of cardinality. The exact side exists to grade the
    * sketch (the q33/q43 pattern: estimates are engine-specific, so the
    * declared output carries exact counts plus an in-bounds assertion).
    *
    * A CMS is just a counting matrix — `C[d][h_d(v)] += 1` — and since
    * this op's contract already pays one per-value count shuffle for the
    * exact side, the counters fold FROM those counts: `C[d][b] =
    * Σ freq(v) over v hashing to b` — a codegen'd groupBy over O(vocab)
    * rows, so the corpus is read and tokenized exactly ONCE
    * (`df.stat.countMinSketch` re-read it through an interpreted RDD
    * aggregate and landed the whole matrix on the driver; the one-pass
    * rewrite measured 0.95 → 0.35 s at sf0.1). For a vocabulary too big
    * to count exactly — the pure-sketch regime — build counters straight
    * off the values with the same `buckets()` explode + groupBy(d, b):
    * bounded state, one pass, no per-value shuffle. Estimates stay
    * distributed: the k candidates explode to k×depth probe keys that
    * broadcast-join the counters and take `min(cnt)` per value; N rides
    * a broadcast 1-row frame. Counters are exact integer sums —
    * bit-deterministic under any partitioning.
    * Output: (value, freq, est_in_bounds), top-k by (freq desc, value). */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, k: Int = 20,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val width = math.ceil(math.E / eps).toLong
    val depth = math.max(1, math.ceil(math.log(1.0 / (1.0 - confidence))).toInt)
    def buckets(v: Column) = explode(array((0 until depth).map(d =>
      struct(lit(d).as("d"),
        pmod(xxhash64(lit(seed), lit(d), v), lit(width)).as("b"))): _*))
    val vcounts = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("freq"))
    val counters = vcounts.select(col("freq"), buckets(col("v")).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(sum("freq").as("cnt"))
    val probes = vcounts
      .orderBy(col("freq").desc, col("v").asc).limit(k)
      .select(col("v"), col("freq"), buckets(col("v")).as("db"))
      .select(col("v"), col("freq"), col("db.d").as("d"), col("db.b").as("b"))
    counters.join(broadcast(probes), Seq("d", "b"))
      .groupBy("v", "freq").agg(min("cnt").as("est"))
      .crossJoin(broadcast(vcounts.agg(sum("freq").as("__n"))))
      .select(col("v").as("value"), col("freq"),
        (col("est") >= col("freq") &&
          col("est") <= col("freq") + ceil(lit(eps) * col("__n")).cast("long"))
          .as("est_in_bounds"))
      .orderBy(col("freq").desc, col("value").asc)
  }
}
