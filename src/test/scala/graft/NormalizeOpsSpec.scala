package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalizeExpr
import graft.ops.{Sampling, TextAnalysis}

/** Round-5 curation additions: NFC normalization (native expression),
  * boilerplate line filtering, corpus n-gram top-k, shard manifest, and
  * the linear quality scorer.
  *
  * All non-ASCII test data is written as \u escapes so the decomposed
  * (e + U+0301) vs composed (U+00E9) distinction is visible in the
  * source and can't be silently normalized by an editor. */
class NormalizeOpsSpec extends SparkSpec {

  private val eAcuteD = "e\u0301" // decomposed
  private val eAcuteC = "\u00e9"  // composed

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // -- NfcNormalizeExpr ------------------------------------------------

  test("nfc_normalize composes decomposed accents and passes NFC text through") {
    import spark.implicits._
    NfcNormalizeExpr.register(spark)
    val df = Seq(s"caf$eAcuteD", s"caf$eAcuteC", "plain",
        null.asInstanceOf[String])
      .toDF("s")
      .selectExpr("s", "nfc_normalize(s) AS n")
    val rows = df.collect()
    assert(rows(0).getString(1) == s"caf$eAcuteC") // composed now
    assert(rows(1).getString(1) == s"caf$eAcuteC") // unchanged
    assert(rows(2).getString(1) == "plain")
    assert(rows(3).isNullAt(1)) // null in -> null out
  }

  test("nfc_normalize agrees between the expression and the JDK normalizer") {
    val raw = "a\u0300e\u0301i\u0302o\u0303u\u0308 mixed caf" + eAcuteD
    val viaExpr = docs(1L -> raw)
      .select(NfcNormalizeExpr(col("text"))).head.getString(0)
    val viaJdk = java.text.Normalizer.normalize(
      raw, java.text.Normalizer.Form.NFC)
    assert(viaExpr == viaJdk)
    assert(viaExpr != raw) // the input genuinely was not NFC
  }

  test("normalizeText strips control chars BEFORE collapsing whitespace") {
    // "a <BEL> b": strip -> "a  b" -> collapse -> "a b". The reversed
    // order would collapse around the BEL and leave "a <BEL> b".
    // The tab is NOT stripped (it is whitespace, the collapse owns it) -
    // deleting it would weld "b" onto the next word.
    val raw = "a \u0007 b\tc\u0301  d "
    val out = docs(1L -> raw)
      .select(TextAnalysis.normalizeText(col("text"))).head.getString(0)
    assert(out == "a b \u0107 d") // ws collapsed, trimmed, c+acute composed
  }

  test("normalize() reports was_nfc and length delta") {
    val d = TextAnalysis.normalize(
        docs(1L -> s"caf$eAcuteD", 2L -> "cafe"))
      .orderBy("doc_id").collect()
    assert(!d(0).getAs[Boolean]("was_nfc"))
    assert(d(0).getAs[Long]("raw_len") == 5L)   // 4 chars + combining mark
    assert(d(0).getAs[Long]("clean_len") == 4L) // composed e-acute
    assert(d(1).getAs[Boolean]("was_nfc"))
    assert(d(1).getAs[Long]("clean_len") == 4L)
  }

  // -- boilerplateFilter -----------------------------------------------

  test("boilerplate filter keeps only long punctuated lines") {
    val text = Seq(
      "This proper sentence has six words.", // kept
      "nav home about contact",              // no terminal punct -> dropped
      "short.",                              // < 5 words -> dropped
      "Does a question mark also count here?" // kept
    ).mkString("\n")
    val r = TextAnalysis.boilerplateFilter(docs(1L -> text), minWords = 5)
      .head
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("n_kept") == 2L)
    assert(r.getAs[String]("clean_text") ==
      "This proper sentence has six words.\nDoes a question mark also count here?")
  }

  test("boilerplate filter drops everything from an unpunctuated doc") {
    val r = TextAnalysis.boilerplateFilter(docs(1L -> "just words no punct"))
      .head
    assert(r.getAs[Long]("n_kept") == 0L)
    assert(r.getAs[String]("clean_text") == "")
  }

  test("boilerplate filter: trailing whitespace doesn't hide terminal punct") {
    // both predicates run on the TRIMMED line — prose ending '. ' is
    // prose (trim is space-only in both Spark and DuckDB, so a trailing
    // tab still drops the line — the engines agree either way)
    val text = "A real sentence with five words. \n  Indented sentence also has enough words.  "
    val r = TextAnalysis.boilerplateFilter(docs(1L -> text), minWords = 5).head
    assert(r.getAs[Long]("n_kept") == 2L)
  }

  // -- ngramTopK -------------------------------------------------------

  test("ngramTopK counts the 2-gram multiset and breaks ties by gram") {
    val d = docs(1L -> "a b a b c", 2L -> "a b x")
    // 2-grams: doc1: "a b","b a","a b","b c"; doc2: "a b","b x"
    val rows = TextAnalysis.ngramTopK(d, n = 2, k = 3).collect()
    assert(rows(0).getString(0) == "a b" && rows(0).getLong(1) == 3L)
    // freq-1 ties are ordered alphabetically: "b a" < "b c" < "b x"
    assert(rows(1).getString(0) == "b a" && rows(1).getLong(1) == 1L)
    assert(rows(2).getString(0) == "b c")
  }

  test("ngramTopK plan is partial-agg + TakeOrderedAndProject (no global sort)") {
    val d = docs(1L -> "a b c")
    val plan = TextAnalysis.ngramTopK(d, 2, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.toLowerCase.contains("partial"), plan)
  }

  // -- shardManifest ---------------------------------------------------

  test("shard manifest partitions every doc exactly once with stable stats") {
    val d = docs((0L until 100L).map(i => i -> s"doc $i words here"): _*)
    val m = Sampling.shardManifest(d, nShards = 8).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == 100L)
    assert(m.map(_.getAs[Long]("shard")).toSet.subsetOf((0L until 8L).toSet))
    assert(m.map(_.getAs[Long]("n_tokens")).sum == 400L) // 4 tokens per doc
    // deterministic: a rerun yields the identical manifest
    val again = Sampling.shardManifest(d, nShards = 8).collect()
    assert(m.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  // -- qualityScore ----------------------------------------------------

  test("quality score is the sigmoid of the rounded features and gates keep") {
    val d = docs(
      1L -> ("the project of building a fast engine is work and the " * 5 + "end."),
      2L -> "x.")
    val rows = TextAnalysis.qualityScore(d, threshold = 0.5)
      .orderBy("doc_id").collect()
    for (r <- rows) {
      val w = TextAnalysis.qualityWeights
      val z = w("bias") +
        w("log_tokens") * math.log(1.0 + r.getAs[Long]("n_tokens")) +
        w("stop_ratio") * r.getAs[Double]("stop_ratio") +
        w("punct_ratio") * r.getAs[Double]("punct_ratio") +
        w("avg_token_len") * r.getAs[Double]("avg_token_len")
      val expected = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("q_score") - expected) < 1e-9,
        s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Boolean]("keep") == (r.getAs[Double]("q_score") >= 0.5))
    }
    // the long stopword-rich doc scores above the terse fragment
    assert(rows(0).getAs[Double]("q_score") > rows(1).getAs[Double]("q_score"))
  }
}
