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
}
