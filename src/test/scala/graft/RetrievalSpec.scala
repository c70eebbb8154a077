package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.ops.Retrieval

/** BM25 retrieval graded against an independent in-test reference scorer
  * (naive in-memory Okapi BM25 over the same tokenization), plus plan and
  * determinism checks. */
class RetrievalSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark join shuffle spark spark"),
    (1L, "join join table scan"),
    (2L, "shuffle partition broadcast join spark"),
    (3L, "table scan filter fast fast"),
    (4L, "completely unrelated words here"),
    (5L, "spark")).toDF("doc_id", "text")

  private val queries = Seq(1 -> Seq("spark", "join"), 2 -> Seq("fast", "scan"))

  /** Naive reference BM25 (Lucene idf), same 6-dp rounding contract. */
  private def refBm25(corpus: Seq[(Long, String)], qs: Seq[(Int, Seq[String])],
      k: Int, k1: Double = 1.2, b: Double = 0.75): Seq[(Int, Long, Double, Long)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    def round6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    qs.flatMap { case (qid, terms) =>
      val perDoc = toks.toSeq.flatMap { case (did, ts) =>
        val hits = terms.distinct.flatMap { term =>
          val tf = ts.count(_ == term)
          if (tf == 0) None else {
            val df = toks.values.count(_.contains(term)).toDouble
            val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            Some(round6(idf * (tf * (k1 + 1)) /
              (tf + k1 * (1 - b + b * ts.size / avgdl))))
          }
        }
        if (hits.isEmpty) None
        else Some((qid, did, round6(hits.sum), hits.size.toLong))
      }
      perDoc.sortBy { case (_, did, s, _) => (-s, did) }.take(k)
    }
  }

  test("bm25TopK matches the naive reference scorer") {
    val got = Retrieval.bm25TopK(docs, Retrieval.queryFrame(spark, queries), k = 3)
      .orderBy("query_id", "doc_id")
      .as[(Int, Long, Double, Long)].collect().toSeq
    val want = refBm25(docs.as[(Long, String)].collect().toSeq, queries, k = 3)
      .sortBy { case (q, d, _, _) => (q, d) }
    assert(got == want)
  }

  test("only matching docs appear and k caps each query") {
    val got = Retrieval.bm25TopK(docs, Retrieval.queryFrame(spark, queries), k = 2)
      .as[(Int, Long, Double, Long)].collect()
    assert(got.groupBy(_._1).forall(_._2.length <= 2))
    assert(!got.map(_._2).contains(4L)) // doc 4 shares no query term
    // rarer terms rank higher: for query 1, doc 0 (3×spark + join) beats doc 1
    val q1 = got.filter(_._1 == 1).sortBy(-_._3).map(_._2)
    assert(q1.head == 0L)
  }

  test("query side broadcasts and top-k uses the bounded-heap operator") {
    val plan = Retrieval.bm25TopK(docs, Retrieval.queryFrame(spark, queries))
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastNestedLoopJoin"))
    assert(s.contains("ExactTopK") || s.contains("PartialTopK"))
  }

  test("ranking is partitioning-invariant") {
    val a = Retrieval.bm25TopK(docs.repartition(1),
      Retrieval.queryFrame(spark, queries)).orderBy("query_id", "doc_id").collect()
    val b = Retrieval.bm25TopK(docs.repartition(5),
      Retrieval.queryFrame(spark, queries)).orderBy("query_id", "doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  // ---- phraseTopK ----

  /** Naive reference: count exact consecutive-token matches per doc. */
  private def refPhrase(corpus: Seq[(Long, String)],
      ps: Seq[(Int, Seq[String])], k: Int): Seq[(Int, Long, Long)] =
    ps.flatMap { case (pid, phrase) =>
      corpus.flatMap { case (did, text) =>
        val ts = text.trim.toLowerCase.split("\\s+").toSeq
        val n = ts.sliding(phrase.length).count(_ == phrase)
        if (n == 0) None else Some((pid, did, n.toLong))
      }.sortBy { case (_, did, n) => (-n, did) }.take(k)
    }

  private val phraseDocs = Seq(
    (0L, "table hash table hash join"),      // 2× "table hash", 1× "hash table"
    (1L, "a a a a"),                         // overlapping "a a" ×3
    (2L, "hash table hash"),                 // 1× "hash table hash" (repeated term)
    (3L, "table join hash"),                 // terms present, never consecutive
    (4L, "nothing relevant")).toDF("doc_id", "text")

  private val phrases = Seq(
    0 -> Seq("table", "hash"),
    1 -> Seq("a", "a"),
    2 -> Seq("hash", "table", "hash"))

  test("phraseTopK matches the naive sliding-window reference") {
    val got = Retrieval.phraseTopK(phraseDocs,
        Retrieval.phraseFrame(spark, phrases), k = 10)
      .as[(Int, Long, Long)].collect().toSeq
      .sortBy { case (p, d, _) => (p, d) }
    val want = refPhrase(phraseDocs.as[(Long, String)].collect().toSeq,
        phrases, k = 10)
      .sortBy { case (p, d, _) => (p, d) }
    assert(got == want)
    // the cases that break naive positional-join implementations:
    assert(got.contains((0, 0L, 2L))) // two disjoint occurrences
    assert(got.contains((1, 1L, 3L))) // overlapping occurrences all count
    assert(got.contains((2, 2L, 1L))) // same term at two phrase offsets
    assert(!got.exists(_._2 == 3L))   // co-occurrence without adjacency ≠ match
  }

  test("phraseTopK broadcasts the phrase table and bounds top-k") {
    val df = Retrieval.phraseTopK(phraseDocs,
      Retrieval.phraseFrame(spark, phrases), k = 1)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"))
    assert(s.contains("ExactTopK") || s.contains("PartialTopK"))
    assert(df.collect().groupBy(_.getInt(0)).forall(_._2.length <= 1))
  }

  test("phraseTopK is partitioning-invariant") {
    val a = Retrieval.phraseTopK(phraseDocs.repartition(1),
      Retrieval.phraseFrame(spark, phrases)).orderBy("phrase_id", "doc_id").collect()
    val b = Retrieval.phraseTopK(phraseDocs.repartition(7),
      Retrieval.phraseFrame(spark, phrases)).orderBy("phrase_id", "doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  // ---- shared index: one corpus pass for both rankers ----

  test("SharedIndex results are identical to the direct rankers") {
    val qf = Retrieval.queryFrame(spark, Seq(1 -> Seq("table", "join"),
      2 -> Seq("hash", "nothing")))
    val pf = Retrieval.phraseFrame(spark, phrases)
    val idx = Retrieval.SharedIndex(phraseDocs, qf, pf)
    try {
      val bmShared = idx.bm25(qf).orderBy("query_id", "doc_id").collect().toSeq
      val bmDirect = Retrieval.bm25TopK(phraseDocs, qf)
        .orderBy("query_id", "doc_id").collect().toSeq
      assert(bmShared == bmDirect)
      val phShared = idx.phrase(pf).orderBy("phrase_id", "doc_id").collect().toSeq
      val phDirect = Retrieval.phraseTopK(phraseDocs, pf)
        .orderBy("phrase_id", "doc_id").collect().toSeq
      assert(phShared == phDirect)
    } finally idx.close()
  }

  test("SharedIndex plans read the cached postings — one tokenize subtree") {
    val qf = Retrieval.queryFrame(spark, queries)
    val pf = Retrieval.phraseFrame(spark, phrases)
    val idx = Retrieval.SharedIndex(docs, qf, pf)
    try {
      idx.postings.count() // materialize the single corpus pass
      for (df <- Seq(idx.bm25(qf), idx.phrase(pf))) {
        val exec = df.queryExecution.executedPlan
        // downstream plans consume the in-memory postings; the corpus
        // tokenize (a live posexplode GenerateExec) runs in NEITHER
        // consumer — it exists only inside the cached relation's build
        // plan, which already ran once
        assert(collectWithSubqueries(exec) {
          case s if s.getClass.getSimpleName.startsWith("InMemoryTableScan") => s
        }.nonEmpty, exec.toString)
        assert(collectWithSubqueries(exec) {
          case g: org.apache.spark.sql.execution.GenerateExec => g
        }.isEmpty, exec.toString)
      }
    } finally idx.close()
  }

  test("vocabulary cap is enforced, not silently absorbed") {
    import spark.implicits._
    val big = spark.range(Retrieval.maxVocabTerms + 10)
      .selectExpr("concat('t', id) AS term")
    val e = intercept[IllegalArgumentException] {
      Retrieval.collectVocab(big)
    }
    assert(e.getMessage.contains("broadcast-size contract"))
    // literal frames short-circuit driver-side: no job, same cap
    val okTerms = Retrieval.collectVocab(
      Seq("b", "a", "b").toDF("term"))
    assert(okTerms == Seq("a", "b"))
  }
}
