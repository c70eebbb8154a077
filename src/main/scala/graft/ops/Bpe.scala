package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING, distributed — the merge learner
  * of Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
  * Subword Units") re-shaped for Spark. The reference pipeline only ever
  * *counts* tokens with a fixed splitter
  * (`/root/reference/polla_app/analysis/stats.py` token heuristics); a
  * training-data engine has to be able to train the tokenizer itself on
  * the corpus it just curated.
  *
  * Scale shape:
  *  - The corpus is read ONCE: word-type frequencies partial-aggregate
  *    map-side before a single shuffle. Every merge round after that
  *    iterates over the O(|vocab|) word-type table — never the corpus.
  *  - One round = one partial-agg pair count over the word table + a
  *    TakeOrdered(1) (the `ngramTopK` shape) + a map-side array fold
  *    applying the merge. The only driver value per round is the winning
  *    pair — one scalar row, same class as the k-means centroids.
  *  - The word table is re-materialized every `materializeEvery` rounds
  *    ([[Materialize]]: `localCheckpoint` locally, reliable checkpoint
  *    under `graft.checkpoint.dir`) so plan depth stays bounded at any
  *    merge count — the same discipline as connected components / PageRank.
  *
  * Determinism contract (what makes it DuckDB-oracle-checkable): pair
  * counts are exact longs; the winning pair ties-break on (left, right)
  * ascending; merge application is a greedy left-to-right single pass
  * implemented as an array fold, whose result is partition-independent.
  * `text_bpe` / `text_bpe_encode` / `sample_pack_bpe` unroll the rounds
  * as chained DuckDB CTEs and hash-match.
  *
  * Symbol alphabet: lowercased ASCII-alnum word types (`^[a-z0-9]+$`).
  * Other tokens are out-of-alphabet: ignored by training, counted as one
  * opaque subtoken by encoding. No end-of-word marker — merges cannot
  * cross word boundaries anyway because training runs on word types
  * (the GPT-2-style formulation), so the marker would only shift counts.
  */
object Bpe {

  /** One learned merge: at `merge_round`, symbol pair (l_sym, r_sym) →
    * `merged`, with corpus-weighted pair frequency `freq`. */
  case class Merge(merge_round: Int, l_sym: String, r_sym: String,
      merged: String, freq: Long)

  private val alphaRe = "^[a-z0-9]+$"

  /** (word, freq, syms): in-alphabet word types with corpus frequency and
    * their initial single-character symbol arrays. Tokens are materialized
    * in their own projection first (HOF lambda bodies don't CSE with the
    * outer plan — the split would otherwise re-run per element). */
  def wordTable(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents
      .select(TextAnalysis.toks(lower(col(textCol))).as("t"))
      .select(explode(col("t")).as("word"))
      .filter(col("word").rlike(alphaRe))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))))

  /** Adjacent-pair frequencies over the word table, weighted by word
    * frequency. Partial-aggregates before its one shuffle; cardinality is
    * bounded by |symbols|², not the corpus. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l_sym"), col("p.r").as("r_sym"))
      .agg(sum("freq").as("cnt"))

  /** Greedy left-to-right single-pass merge of (l, r) in every word's
    * symbol array — a fold that replaces the accumulator's last element
    * when it is `l` and the incoming symbol is `r`. Because the merged
    * symbol `l+r` never equals `l`, the fold is exactly the reference
    * implementation's non-overlapping pass (a merged run can't re-match
    * within the same round). Map-side only, partition-independent. */
  def applyMerge(words: DataFrame, l: String, r: String): DataFrame =
    words.withColumn("syms",
      when(size(col("syms")) < 2, col("syms")).otherwise(
        aggregate(
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          slice(col("syms"), 1, 1),
          (acc, x) =>
            when(element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x))))))

  /** Corpus-size gate for the driver-side merge loop (r19, the q52
    * small-corpus pattern): at or below this many DOCUMENTS the word-type
    * table collects once — (word, freq) pairs, bounded by the alnum
    * word-TYPE count, which at ≤ 65 k docs is at most a few hundred
    * thousand strings (a few MB) — and all `nMerges` rounds run on the
    * driver. The distributed loop pays ~2 jobs per round (pair-count
    * aggregate + TakeOrdered collect) plus periodic re-materializations
    * of the word table; on a vocab-bounded table that is pure fixed job
    * latency (~1 s of the 1.35 s text_bpe wall at sf0.1). Above the gate
    * the distributed loop runs exactly as before — the 100 TB path.
    * Same doc-count gate family as [[Dedup.simhashCompoundMinDocs]].
    * BpeSpec pins the two branches merge-for-merge identical. */
  val SmallCorpusGate: Long = 65536L

  /** Run up to `nMerges` rounds; returns the learned merge table and the
    * final word→symbols segmentation. Stops early when no adjacent pair
    * remains (fully merged vocabulary).
    *
    * `corpusDocs`: parquet-footer document count, when the caller has it
    * (no job). At or below [[SmallCorpusGate]] the merge loop runs on the
    * driver over the collected word-type table — identical merges and
    * segmentation by construction (exact long counts, same
    * (cnt DESC, l ASC, r ASC) tiebreak — ASCII-only symbols, so JVM
    * string order ≡ Spark's UTF-8 binary order — and the same greedy
    * left-to-right fold); the unknown/huge default keeps the
    * distributed loop. */
  def train(documents: DataFrame, nMerges: Int, textCol: String = "text",
      materializeEvery: Int = 4,
      corpusDocs: Option[Long] = None): (Seq[Merge], DataFrame) = {
    if (corpusDocs.exists(_ <= SmallCorpusGate))
      return trainDriverSide(documents, nMerges, textCol)
    var words = Materialize(wordTable(documents, textCol))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var done = false
    while (round <= nMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l_sym").asc, col("r_sym").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(round, l, r, l + r, c)
        words = applyMerge(words, l, r)
        if (round % materializeEvery == 0) words = Materialize(words)
        round += 1
      }
    }
    (merges.toSeq, Materialize(words))
  }

  /** The small-corpus branch of [[train]]: ONE job collects the
    * (word, freq) type table; pair counting, winner selection, and the
    * greedy merge fold replicate the distributed operators exactly (see
    * the equivalence argument at [[train]]). The returned segmentation
    * frame is vocab-sized — the same rows the encode join broadcasts. */
  private def trainDriverSide(documents: DataFrame, nMerges: Int,
      textCol: String): (Seq[Merge], DataFrame) = {
    val spark = documents.sparkSession
    import spark.implicits._
    val collected: Array[(String, Long)] =
      wordTable(documents, textCol).select("word", "freq")
        .as[(String, Long)].collect()
    // initial segmentation: one single-character symbol per char (the
    // alphabet is ASCII by the wordTable filter, so chars == bytes)
    val syms: Array[Array[String]] =
      collected.map(_._1.toCharArray.map(_.toString))
    val freqs: Array[Long] = collected.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var done = false
    while (round <= nMerges && !done) {
      // adjacent-pair frequencies, weighted by word freq — every
      // occurrence of the pair in a word counts (pairCounts semantics)
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + freqs(wi))
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        // winner under (cnt DESC, l ASC, r ASC) — ASCII symbols, so
        // JVM string compare ≡ Spark's binary UTF-8 order
        val ((l, r), c) = counts.minBy { case ((pl, pr), cnt) =>
          (-cnt, pl, pr)
        }
        merges += Merge(round, l, r, l + r, c)
        // greedy left-to-right single pass — the applyMerge fold verbatim
        wi = 0
        while (wi < syms.length) {
          val s = syms(wi)
          if (s.length >= 2) {
            val out = scala.collection.mutable.ArrayBuffer[String](s(0))
            var i = 1
            while (i < s.length) {
              if (out.last == l && s(i) == r)
                out(out.length - 1) = l + r
              else out += s(i)
              i += 1
            }
            syms(wi) = out.toArray
          }
          wi += 1
        }
        round += 1
      }
    }
    val finalWords = collected.indices
      .map(i => (collected(i)._1, freqs(i), syms(i).toSeq))
      .toDF("word", "freq", "syms")
    (merges.toSeq, finalWords)
  }

  /** The learned merges as a DataFrame (merge_round, l_sym, r_sym,
    * merged, freq) — M driver rows, the trained artifact. */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Per-document subtoken counts under a trained segmentation: explode
    * tokens, one equi-join against the O(|vocab|) word table (broadcast
    * when dimension-sized — AQE handles it), one per-doc partial-agg.
    * Out-of-alphabet tokens count as one opaque subtoken each. */
  def encodeCounts(documents: DataFrame, finalWords: DataFrame,
      textCol: String = "text"): DataFrame =
    documents
      .select(col("doc_id"),
        explode(TextAnalysis.toks(lower(col(textCol)))).as("word"))
      .join(finalWords.select(col("word"), size(col("syms")).as("n_sub")),
        Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("n_sub").cast("long"), lit(1L))).as("n_subtokens"))

  /** Token-budget packing by TRAINED-tokenizer counts instead of the
    * whitespace heuristic — [[Sampling.packByBudget]]'s plan (hash-shard,
    * per-shard running sum under a window) fed by [[encodeCounts]].
    * Packing budgets are what the downstream trainer actually consumes,
    * so they should be measured in the tokenizer's units. */
  def packByBpeBudget(documents: DataFrame, finalWords: DataFrame,
      budgetTokens: Long, nShards: Int = 64,
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    encodeCounts(documents, finalWords, textCol)
      .withColumn("shard",
        pmod(Dedup.md5Long(col("doc_id").cast("string")), lit(nShards.toLong)))
      .withColumn("cum", sum("n_subtokens").over(w))
      .select(col("doc_id"), col("shard"), col("n_subtokens"),
        floor((col("cum") - col("n_subtokens")).cast("double") / budgetTokens)
          .cast("long").as("seq_id"))
  }
}
