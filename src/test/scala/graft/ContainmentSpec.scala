package graft

import graft.ops.Dedup

/** Containment catches the asymmetric near-dup Jaccard misses. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val quote = "alpha beta gamma delta epsilon zeta"
  private val docs = Seq(
    (0L, quote), // fully contained in 1
    (1L, s"intro words before the borrowed part $quote and a long tail " +
      "of completely different material stretching the union far wider " +
      "than the quoted span ever was"),
    (2L, "unrelated content about other things entirely different"))
    .toDF("doc_id", "text")

  test("a quoted doc is fully contained in its superset, not vice versa") {
    val got = Dedup.containmentPairs(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("containment"))).toSeq
    assert(got.exists { case (a, b, c) => a == 0L && b == 1L && c == 1.0 })
    assert(!got.exists { case (a, b, _) => a == 1L && b == 0L }) // < tau
    assert(!got.exists { case (a, b, _) => a == 2L || b == 2L })
  }

  test("jaccard on the same pair is low — the case containment exists for") {
    val a = docs.filter($"doc_id" === 0L)
      .select(Dedup.tokenSet($"text").as("toks_a"), $"doc_id".as("doc_a"))
    val b = docs.filter($"doc_id" === 1L)
      .select(Dedup.tokenSet($"text").as("toks_b"), $"doc_id".as("doc_b"))
    val j = Dedup.jaccardPairs(a.crossJoin(b))
      .collect().head.getAs[Double]("jaccard")
    assert(j < 0.5)
  }

  test("hot shingles above the df cap generate no pairs") {
    val spam = (0L to 9L).map(i => (i, "same same same same same"))
      .toDF("doc_id", "text")
    // every shingle appears in all 10 docs > maxDf=5 ⇒ no postings survive
    assert(Dedup.containmentPairs(spam, tau = 0.0, maxDf = 5).count() == 0)
  }
}
