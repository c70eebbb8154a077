package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** skewSafe containment: the CMS prefilter must cut every truly-hot
  * shingle BEFORE the sh exchange and agree with the exact path when
  * the sketch is collision-free at test scale (CMS never
  * underestimates, so agreement means no overestimate fired either). */
class ContainmentSkewSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // every doc carries the same hot 3-shingle ("common boilerplate
    // sentence"), df = 60 >> maxDf; pairs of docs share a quote
    val hot = "common boilerplate sentence"
    (0L until 60L).map { i =>
      val quote = s"shared quote number ${i / 2} with several tokens"
      (i, s"$hot doc $i unique words ${i}a ${i}b $quote")
    }.toDF("doc_id", "text")
  }

  test("skewSafe and exact modes agree on a hot-shingle corpus") {
    val exact = Dedup.containmentPairs(corpus, k = 3, tau = 0.3, maxDf = 10)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val safe = Dedup.containmentPairs(corpus, k = 3, tau = 0.3, maxDf = 10,
        skewSafe = true)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty, "fixture must produce containment pairs")
    assert(safe == exact, "CMS prefilter changed results on a collision-free corpus")
  }

  test("noise-aware cut: collision-saturated sketch must NOT false-drop " +
      "cool shingles (modes agree even when eps*N >> maxDf)") {
    // cmsEps = 1.0 -> 64 buckets for thousands of distinct shingles:
    // every bucket's counter dwarfs maxDf, so the r9 `est <= maxDf` cut
    // dropped EVERYTHING cool (measured at sf1: 5477 vs 5320 pairs) —
    // the noise-aware threshold (maxDf + eps*N) must keep agreement
    val exact = Dedup.containmentPairs(corpus, k = 3, tau = 0.3, maxDf = 10)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val saturated = Dedup.containmentPairs(corpus, k = 3, tau = 0.3,
        maxDf = 10, skewSafe = true, cmsEps = 1.0)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(saturated == exact,
      "saturated CMS false-dropped cool shingles — noise floor not honored")
  }

  test("CMS prefilter cuts hot postings before the exchange") {
    // the hot shingle appears in all 60 docs; with maxDf = 10 the
    // prefiltered posting table must not contain its hash at all
    val hotHash = Dedup.md5Long(lit("common boilerplate sentence"))
    val post = corpus
      .select(col("doc_id"),
        explode(Dedup.shinglesOf(
          graft.functions.WsSplitExpr.wsSplit(trim(lower(col("text")))), 3)).as("s"))
      .select(Dedup.md5Long(col("s")).as("sh"))
    // sanity: the hot shingle IS in the raw postings 60 times
    assert(post.join(spark.range(1).select(hotHash.as("sh")), "sh").count() == 60)
    // and the skewSafe result still matches exact (previous test) while
    // never having shuffled those 60 postings — pinned structurally: the
    // filter sits below the repartition in the plan
    val plan = Dedup.containmentPairs(corpus, k = 3, tau = 0.3, maxDf = 10,
      skewSafe = true).queryExecution.optimizedPlan.toString
    val filterIdx = plan.indexOf("least(")
    val repartIdx = plan.indexOf("Repartition")
    assert(filterIdx >= 0, "CMS probe expression missing from the plan")
    assert(repartIdx >= 0 && repartIdx < filterIdx,
      "CMS filter must evaluate below (after in plan text) the repartition")
  }
}
