package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Pins `dedup_embedding_cosine_w`'s corpus-scaled width machinery at
  * the points no committed gate exercises (r16 VERDICT item 3 + ADVICE):
  * every oracle hash run derives b = 8, so the width formula's step
  * boundaries and the > 8-bit bucket construction were asserted only by
  * inspection until this spec.
  *
  *  - the width formula at its exact strict-inequality boundaries
  *    (n = 25 600 vs 25 601, …, 838 860 800 vs 838 860 801);
  *  - Spark `signBucket` ≡ the oracle's generated SQL CASE chain,
  *    evaluated in Spark SQL at b = 9 (forced by a ~30 k synthetic
  *    corpus through the same formula) and at the b = 24 ceiling — both
  *    texts come from `Similarity.signBucketCaseSql`, the single
  *    generator the committed DuckDB oracle uses (idxBase 1 there for
  *    DuckDB's 1-based lists, 0 here).
  */
class CosineWidthSpec extends SparkSpec {

  test("corpusScaledSignBits: strict-inequality step boundaries") {
    val cases = Seq(
      0L -> 8, 1L -> 8,
      25600L -> 8, 25601L -> 9,          // first step: n > 100·2^8
      51200L -> 9, 51201L -> 10,
      102400L -> 10, 102401L -> 11,
      204800L -> 11, 204801L -> 12,
      2000000L -> 15,                    // sf100's 2 M vectors → 32 768 buckets
      838860800L -> 23, 838860801L -> 24, // last step: n > 100·2^23
      Long.MaxValue -> 24)               // ceiling: never exceeds 24 dims
    cases.foreach { case (n, expect) =>
      assert(Similarity.corpusScaledSignBits(n) === expect,
        s"width at n=$n")
    }
    // the committed gate SFs, for the record: sf0.01 (~2.5 k) and sf1
    // (20 k) stay at the base width; sf10 (200 k) is the first gated SF
    assert(Similarity.corpusScaledSignBits(2500L) === 8)
    assert(Similarity.corpusScaledSignBits(20000L) === 8)
    assert(Similarity.corpusScaledSignBits(200000L) === 11)
  }

  test("signBucket ≡ oracle CASE chain at b = 9 (30 k corpus) and b = 24") {
    import spark.implicits._
    // ~30 k rows forces b = 9 through the same formula the query uses
    val n = 30000L
    val b = Similarity.corpusScaledSignBits(n)
    assert(b === 9)
    // deterministic synthetic 24-dim vectors including exact zeros —
    // emb[i] = ((id >> i) mod 5) − 2 ∈ {−2,−1,0,1,2} — per-dimension
    // signs vary independently with id's bits, and the exact-zero value
    // exercises the `>= 0` sign boundary, not just generic positives
    val dims = 24
    val vecs = spark.range(n).select(col("id"),
      array((0 until dims).map(i =>
        (shiftright(col("id"), i) % 5 - 2).cast("double")): _*).as("emb"))
    for (width <- Seq(b, 24)) {
      val caseSql = Similarity.signBucketCaseSql(24, idxBase = 0)
      val both = vecs
        .withColumn("b", lit(width))
        .withColumn("scala_bucket", Similarity.signBucket(col("emb"), width))
        .selectExpr("id", "scala_bucket", s"($caseSql) AS sql_bucket")
      val mismatches = both
        .filter(col("scala_bucket") =!= col("sql_bucket")).count()
      assert(mismatches === 0L, s"bucket parity at b=$width")
      // sanity: at b=9 buckets span [0, 512); the synthetic corpus is
      // dense enough that many distinct buckets must appear
      val distinctB = both.select("scala_bucket").distinct().count()
      assert(distinctB > 16L, s"degenerate bucketing at b=$width")
    }
  }

  test("oracle SQL text embeds the generator's chain verbatim") {
    // the committed DuckDB oracle must contain the idxBase-1 rendering —
    // a hand-edit of either side breaks this pin
    val sql = SparkEntry.oracleSql("dedup_embedding_cosine_w")
    assert(sql.contains(Similarity.signBucketCaseSql(24, idxBase = 1)))
  }
}
