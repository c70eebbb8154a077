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
  * Both rankers consume ONE shared intermediate — vocabulary-pruned
  * positional postings ([[positionalPostings]]): (doc_id, dl, pos, term)
  * for query/phrase terms only. BM25 derives (tf, dl) from it by a
  * count-aggregate; exact-phrase intersects it by base position. Running
  * both in one session through [[SharedIndex]] tokenizes the corpus ONCE
  * (the postings are persisted; they are vocabulary-pruned, so their size
  * is O(matching occurrences), never O(corpus) — cache-safe at 100 TB as
  * long as the vocabulary honors the broadcast-size contract below).
  *
  * Scale shape (100 TB corpus, a handful-to-thousands of queries):
  *   - the query/phrase set is broadcast (it is tiny by construction, and
  *     [[maxVocabTerms]] ENFORCES it — a million-term "query set" would
  *     silently degrade the literal-array prune, so it is rejected, not
  *     absorbed);
  *   - the corpus is scanned ONCE and the token stream is filtered to
  *     query terms map-side BEFORE the first shuffle, so the shuffle
  *     carries only matching postings, not the corpus vocabulary;
  *   - document length and the corpus-wide average length are one
  *     map-side projection and a 1-row broadcast aggregate;
  *   - per-term document frequency is a window over the already
  *     query-pruned postings (grouping by term restricted to query terms
  *     still counts every matching doc, so df is exact);
  *   - the final top-k per key runs on [[graft.plans.GroupedTopK]] —
  *     bounded map-side heaps prune to ≤ k rows per key per partition
  *     before the shuffle.
  *
  * Determinism: per-term BM25 contributions are rounded to 6 dp before
  * the per-(query, doc) sum and the summed score is rounded again, so the
  * ranking is bit-stable across partitionings and engines; ties break on
  * doc_id. Phrase counts are integers — no float surface at all.
  */
object Retrieval {

  /** Hard cap on the distinct retrieval vocabulary (query terms + phrase
    * tokens). The pruning strategy embeds the vocabulary as a broadcast
    * literal array scanned per token — correct and fast for the
    * "handful-to-thousands of queries" contract, quietly degrading if a
    * caller feeds a corpus-sized term table. Enforced, not assumed: the
    * driver-side collect is LIMIT-bounded so an oversized input fails
    * with this contract named, never an OOM. */
  val maxVocabTerms: Int = 10000

  /** Driver-side distinct vocabulary of a 1-column term frame, honoring
    * [[maxVocabTerms]]. For a literal frame (the common case: queries and
    * phrases are built with [[queryFrame]]/[[phraseFrame]]) the optimized
    * plan is a `LocalRelation` and the terms are read straight out of it
    * — zero Spark jobs, which is most of the small-SF constant of a
    * retrieval query. Anything else pays one LIMIT-bounded distinct. */
  private[graft] def collectVocab(terms: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    // null terms are dropped, not matched: a null can never equal a token,
    // and letting one through NPEs here (getUTF8String / .sorted) with no
    // mention of the actual problem
    val vals: Seq[String] = terms.queryExecution.optimizedPlan match {
      case lr: LocalRelation if lr.output.size == 1 =>
        lr.data.flatMap(r => Option(r.getUTF8String(0)).map(_.toString))
      case _ =>
        terms.na.drop().distinct().limit(maxVocabTerms + 1).collect()
          .map(_.getString(0)).toSeq
    }
    val distinct = vals.distinct
    require(distinct.size <= maxVocabTerms,
      s"retrieval vocabulary exceeds the broadcast-size contract " +
        s"($maxVocabTerms distinct terms) — pre-aggregate or shard the " +
        "query set instead of feeding a corpus-sized term table")
    distinct.sorted
  }

  /** Corpus-wide document count and average token length — the 1-row
    * broadcast side of BM25. One map-side projection + final aggregate. */
  def corpusStats(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents.select(TextAnalysis.toks(lower(col(textCol))).as("__t"))
      .agg(count(lit(1)).as("n_docs"),
        avg(size(col("__t")).cast("double")).as("avgdl"))

  /** Vocabulary-pruned positional postings: one row per occurrence of a
    * vocabulary term — (doc_id, dl, pos, term). The positional
    * intermediate the phrase ranker (and the [[SharedIndex]]) consume.
    *
    * Shape, MEASURED at sf0.1 (r10): posexplode then filter. Pruning
    * inside the array instead (zip each token with its index into a
    * struct, filter, then explode — tried in r10 to dodge the
    * `InferFiltersFromGenerate` tokenize duplication) allocates a second
    * struct array per document and benched 0.23 s SLOWER per corpus pass
    * than eating the duplicated `size(tokens) > 0` guard, whose
    * re-tokenize costs ~0.08 s after codegen subexpression elimination.
    * The generator streams; rows die in the fused filter before anything
    * downstream. `dl` rides along on every posting, so no doc-length
    * join is ever needed — a separate length frame would re-tokenize the
    * corpus as a second consumer. */
  def positionalPostings(documents: DataFrame, vocab: Seq[String],
      textCol: String = "text"): DataFrame = {
    val terms = vocab.distinct.sorted
    require(terms.size <= maxVocabTerms,
      s"retrieval vocabulary exceeds the broadcast-size contract ($maxVocabTerms)")
    documents
      .select(col("doc_id"), TextAnalysis.toks(lower(col(textCol))).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        posexplode(col("__t")).as(Seq("pos", "term")))
      .filter(array_contains(typedlit(terms), col("term")))
  }

  /** NON-positional occurrence rows — (doc_id, dl, term), one row per
    * matching occurrence. What standalone BM25 consumes: without the
    * position column the prune CAN live inside the token array (a plain
    * string-array filter, no struct zip), which keeps the generator
    * input a HOF expression, so `InferFiltersFromGenerate` leaves the
    * tokenize alone (SPARK-36715) — one tokenizer run per row and no
    * per-token struct allocation. */
  private def occurrenceRows(documents: DataFrame, vocab: Seq[String],
      textCol: String): DataFrame =
    documents
      .select(col("doc_id"), TextAnalysis.toks(lower(col(textCol))).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(filter(col("__t"),
          t => array_contains(typedlit(vocab), t))).as("term"))

  /** Okapi BM25 (Lucene idf form: ln(1 + (N − df + ½)/(df + ½)), always
    * positive) top-`k` docs per query.
    *
    * @param queries (query_id: int, term: string) — one row per query term,
    *                broadcast-sized by construction (enforced via
    *                [[maxVocabTerms]]).
    */
  def bm25TopK(documents: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text"): DataFrame = {
    val vocab = collectVocab(queries.select("term"))
    bm25FromPostings(occurrenceRows(documents, vocab, textCol),
      corpusStats(documents, textCol), queries, k, k1, b)
  }

  /** BM25 over a prebuilt occurrence frame — one row per matching
    * occurrence, (doc_id, dl, term) at minimum; extra columns (pos)
    * are ignored, so [[positionalPostings]] output (the shared-index
    * path) and [[occurrenceRows]] both work. `postings` may carry a
    * broader vocabulary than `queries` (phrase terms, other query
    * sets): df is computed per term, and the broadcast join on the
    * query terms restricts the output, so extra terms cost window work
    * proportional to THEIR postings and nothing else. */
  def bm25FromPostings(postings: DataFrame, stats: DataFrame,
      queries: DataFrame, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // tf per (doc, term); dl is functionally dependent on doc_id so
    // max() is order-agnostic. The `pos` column dies in this projection,
    // before the shuffle.
    val tfs = postings.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    // per-term document frequency as a WINDOW over the tf pass — one row
    // per (doc, term) exists, so count() over the term partition IS df.
    // A separate groupBy("term") frame would re-evaluate the whole
    // tokenize subtree as a second consumer; the window costs one
    // exchange of the already query-pruned postings instead.
    val scored = tfs
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
    * @param phrases (phrase_id: int, offset: int, term: string) — one row
    *                per token position, offsets 0..len−1 unique per
    *                phrase (see [[phraseFrame]]); broadcast-sized
    *                (enforced via [[maxVocabTerms]]).
    */
  def phraseTopK(documents: DataFrame, phrases: DataFrame, k: Int = 10,
      textCol: String = "text"): DataFrame = {
    val vocab = collectVocab(phrases.select("term"))
    phraseFromPostings(positionalPostings(documents, vocab, textCol),
      phrases, k)
  }

  /** Exact-phrase top-k over a prebuilt postings frame — the shared-index
    * path. Terms outside this phrase set die in the broadcast join.
    *
    * ONE exchange for both aggregation levels: the explicit repartition
    * on (phrase_id, doc_id) — a SUBSET of the first grouping key and
    * exactly the second — satisfies the clustering requirement of the
    * per-(phrase, doc, base) count AND the per-(phrase, doc) occurrence
    * count, so neither adds its own shuffle (the q08/q41 trick). Letting
    * each groupBy plan independently costs two full exchanges of the
    * same rows. Skew-safe: the key includes doc_id, so even a phrase
    * matching the whole corpus spreads across every partition. */
  def phraseFromPostings(postings: DataFrame, phrases: DataFrame,
      k: Int = 10): DataFrame = {
    val plens = phrases.groupBy("phrase_id")
      .agg(count(lit(1)).as("__plen"))
    val scored = postings
      .join(broadcast(phrases), "term")
      .select(col("phrase_id"), col("doc_id"),
        (col("pos") - col("offset")).cast("long").as("base"))
      .repartition(col("phrase_id"), col("doc_id"))
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

  /** One corpus pass serving BOTH rankers: positional postings for the
    * UNION vocabulary (query terms + phrase tokens) plus the 1-row
    * corpus stats, persisted, so `bm25(...)` and `phrase(...)` in the
    * same session tokenize the corpus exactly once between them.
    *
    * Cache safety at 100 TB: the persisted frame is vocabulary-pruned —
    * its size is O(occurrences of the ≤ [[maxVocabTerms]] vocabulary
    * terms), not O(corpus) — and MEMORY_AND_DISK spills rather than
    * evicts under pressure. Call [[close]] when done. */
  final class SharedIndex(documents: DataFrame, vocab: Seq[String],
      textCol: String = "text") {
    import org.apache.spark.storage.StorageLevel
    val postings: DataFrame =
      positionalPostings(documents, vocab, textCol)
        .persist(StorageLevel.MEMORY_AND_DISK)
    val stats: DataFrame =
      corpusStats(documents, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    def bm25(queries: DataFrame, k: Int = 10, k1: Double = 1.2,
        b: Double = 0.75): DataFrame =
      bm25FromPostings(postings, stats, queries, k, k1, b)
    def phrase(phrases: DataFrame, k: Int = 10): DataFrame =
      phraseFromPostings(postings, phrases, k)
    def close(): Unit = { postings.unpersist(); stats.unpersist() }
  }

  object SharedIndex {
    /** Build from the query + phrase tables themselves (union vocab).
      * The [[maxVocabTerms]] contract is on the UNION — two sets that
      * individually pass can still exceed it combined; enforce here with
      * the union named, so the failure points at the right knob instead
      * of surfacing as a generic reject inside [[positionalPostings]]. */
    def apply(documents: DataFrame, queries: DataFrame, phrases: DataFrame,
        textCol: String = "text"): SharedIndex = {
      val union = (collectVocab(queries.select("term")) ++
        collectVocab(phrases.select("term"))).distinct.sorted
      require(union.size <= maxVocabTerms,
        s"shared retrieval vocabulary (query terms ∪ phrase tokens, " +
          s"${union.size} distinct) exceeds the broadcast-size contract " +
          s"($maxVocabTerms) — the cap applies to the UNION when sharing " +
          "one index; shard the query/phrase sets or build per-ranker " +
          "indexes (bm25TopK / phraseTopK) instead")
      new SharedIndex(documents, union, textCol)
    }
  }
}
