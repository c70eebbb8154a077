package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.GroupedTopK

/** Sparse lexical retrieval over the corpus — the "find the training docs
  * that answer this query" primitive (reference scope: the corpus-query
  * surface of `polla/analysis.py`; retrieval itself is a north-star
  * extension, same family as TF-IDF at
  * [[graft.ops.TextAnalysis.tfidf]]).
  *
  * Scale shape (100 TB corpus, a handful-to-thousands of queries):
  *   - the query set is broadcast (it is tiny by construction); the
  *     corpus is scanned ONCE and the explode is filtered to query
  *     terms map-side BEFORE the (doc, term) aggregation, so the first
  *     shuffle carries only matching postings, not the whole corpus
  *     vocabulary;
  *   - document length and the corpus-wide average length are one
  *     map-side projection and a 1-row broadcast aggregate;
  *   - per-term document frequency is a partial-agg over the already
  *     query-pruned postings (grouping by term restricted to query
  *     terms still counts every matching doc, so df is exact);
  *   - the final top-k per query runs on [[graft.plans.GroupedTopK]] —
  *     bounded map-side heaps prune to ≤ k rows per query per
  *     partition before the shuffle.
  *
  * Determinism: per-term contributions are rounded to 6 dp before the
  * per-(query, doc) sum and the summed score is rounded again, so the
  * ranking is bit-stable across partitionings and engines; ties break
  * on doc_id.
  */
object Retrieval {

  /** Okapi BM25 (Lucene idf form: ln(1 + (N − df + ½)/(df + ½)), always
    * positive) top-`k` docs per query.
    *
    * @param queries (query_id: int, term: string) — one row per query term,
    *                broadcast-sized by construction.
    */
  def bm25TopK(documents: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text"): DataFrame = {
    val lens = documents.select(col("doc_id"),
      size(TextAnalysis.toks(lower(col(textCol)))).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))

    val postings = documents
      .select(col("doc_id"), explode(TextAnalysis.toks(lower(col(textCol)))).as("term"))
      .join(broadcast(queries.select("term").distinct()), "term")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

    val dfByTerm = postings.groupBy("term").agg(count(lit(1)).as("df"))

    val scored = postings
      .join(broadcast(dfByTerm), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(queries), "term")
      .withColumn("contrib", round(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))),
        6))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("contrib"), 6).as("score"), count(lit(1)).as("n_terms_hit"))

    GroupedTopK.perKey(scored, "query_id",
        Seq(("score", false), ("doc_id", true)), k)
      .select("query_id", "doc_id", "score", "n_terms_hit")
  }

  /** Literal query sets as a (query_id, term) frame — test/demo helper. */
  def queryFrame(spark: SparkSession, qs: Seq[(Int, Seq[String])]): DataFrame = {
    import spark.implicits._
    qs.flatMap { case (id, terms) => terms.map(t => (id, t)) }
      .toDF("query_id", "term")
  }
}
