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
    // tokenize ONCE into a materialized column (lambda bodies don't CSE);
    // dl rides along through the explode so no doc-length join is ever
    // needed — the r8 shape joined postings back to a per-doc length
    // frame on doc_id, which re-tokenized the corpus a second time AND
    // re-exchanged every posting by doc_id. Both costs scale with the
    // corpus, the fix with nothing.
    val toked = documents.select(col("doc_id"),
      TextAnalysis.toks(lower(col(textCol))).as("__t"))
    val stats = toked.agg(count(lit(1)).as("n_docs"),
      avg(size(col("__t")).cast("double")).as("avgdl"))

    // prune INSIDE the token array before exploding: query terms are
    // driver-collectable by the same broadcast-size contract the ANN
    // ops use, so the membership test is a codegen'd literal-array scan
    // per token and the explode emits only matching occurrences — at a
    // 500k-token sf0.1 corpus that is a 10×+ row-volume cut before the
    // first shuffle, and the ratio improves with corpus size
    val terms = queries.select("term").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val postings = toked
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(filter(col("__t"),
          t => array_contains(typedlit(terms), t))).as("term"))
      // dl is functionally dependent on doc_id; max() is order-agnostic
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"), max("dl").as("dl"))

    // per-term document frequency as a WINDOW over the postings pass —
    // one row per (doc, term) exists, so count() over the term partition
    // IS df. A separate groupBy("term") frame would re-evaluate the
    // whole tokenize subtree as a second consumer; the window costs one
    // exchange of the already query-pruned postings instead.
    val scored = postings
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("term")))
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

  /** Exact-phrase retrieval over positional postings: top-`k` docs per
    * phrase ranked by occurrence count — the capability bag-of-words
    * BM25 cannot express ("slow hash batch" as consecutive tokens, not
    * three independent terms).
    *
    * Positional intersection WITHOUT per-adjacent-term self-joins: each
    * matching token occurrence is mapped to the phrase start it would
    * belong to (`base = pos − offset`), so a complete occurrence is
    * exactly a (phrase, doc, base) group whose hit count equals the
    * phrase length — n-token phrases cost the SAME single shuffle as
    * 2-token ones, instead of n−1 join stages. Per (base, offset) at
    * most one row exists (the token at base+offset either is the
    * offset's term or is not), so `hits == plen` cannot over-count.
    *
    * Scale shape (the bm25TopK contract): phrase vocabulary pruned
    * INSIDE the token array map-side before posexplode — the shuffle
    * carries only occurrences of phrase terms; the (term, phrase,
    * offset) table and per-phrase lengths are broadcast; final top-k
    * docs per phrase via [[graft.plans.GroupedTopK]] bounded heaps.
    * Counts are integers — no float determinism concerns.
    *
    * @param phrases (phrase_id: int, offset: int, term: string) — one row
    *                per token position, offsets 0..len−1 unique per
    *                phrase (see [[phraseFrame]]); broadcast-sized.
    */
  def phraseTopK(documents: DataFrame, phrases: DataFrame, k: Int = 10,
      textCol: String = "text"): DataFrame = {
    val toked = documents.select(col("doc_id"),
      TextAnalysis.toks(lower(col(textCol))).as("__t"))
    val vocab = phrases.select("term").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val positions = toked
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("pos", "term")))
      .filter(array_contains(typedlit(vocab), col("term")))
    val plens = phrases.groupBy("phrase_id")
      .agg(count(lit(1)).as("__plen"))
    val scored = positions
      .join(broadcast(phrases), "term")
      .select(col("phrase_id"), col("doc_id"),
        (col("pos") - col("offset")).cast("long").as("base"))
      .groupBy("phrase_id", "doc_id", "base")
      .agg(count(lit(1)).as("__hits"))
      .join(broadcast(plens), "phrase_id")
      .filter(col("__hits") === col("__plen"))
      .groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
    GroupedTopK.perKey(scored, "phrase_id",
        Seq(("n_occurrences", false), ("doc_id", true)), k)
      .select("phrase_id", "doc_id", "n_occurrences")
  }

  /** Literal phrases as a (phrase_id, offset, term) frame — helper. */
  def phraseFrame(spark: SparkSession, ps: Seq[(Int, Seq[String])]): DataFrame = {
    import spark.implicits._
    ps.flatMap { case (id, terms) =>
        terms.zipWithIndex.map { case (t, i) => (id, i, t) } }
      .toDF("phrase_id", "offset", "term")
  }
}
