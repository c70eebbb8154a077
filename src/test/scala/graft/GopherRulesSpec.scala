package graft

import org.apache.spark.sql.functions.col

import graft.ops.TextAnalysis

/** Gopher rule battery: each rule tripped by a crafted document, the
  * conjunction, and the one-scan failure attribution. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // One clean doc + one violator per rule (word-count band 5..100 here).
  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and that is all with style"),
    (1L, "too short"),                                       // r_word_count
    (2L, ("a " * 200).trim),                                 // r_word_count (long) + mean len + stopwords
    (3L, "the aaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbb cccccccccccccccccccccccc dddddddddddddddddddddddd"), // r_mean_word_len
    (4L, "the # # # # # # # # # # price # of # things #"),   // r_symbol_ratio
    (5L, "- one\n- two\n- three\n- four\nthe end of that"),  // r_bullet_ratio (4/5 lines)
    (6L, "the story continues...\nand then...\nmore...\nthe end"), // r_ellipsis_ratio
    (7L, "the 123 456 789 0 1 2 3 4 5 6"),                   // r_alpha_ratio
    (8L, "zebra quark mango delta epsilon gamma iota kappa")) // r_stopwords
    .toDF("doc_id", "text")

  private def flags = TextAnalysis.gopherRules(docs, minWords = 5,
      maxWords = 100, maxBulletRatio = 0.5)
    .orderBy("doc_id").collect()
    .map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Boolean]("r_word_count"), r.getAs[Boolean]("r_mean_word_len"),
        r.getAs[Boolean]("r_symbol_ratio"), r.getAs[Boolean]("r_bullet_ratio"),
        r.getAs[Boolean]("r_ellipsis_ratio"), r.getAs[Boolean]("r_alpha_ratio"),
        r.getAs[Boolean]("r_stopwords"), r.getAs[Boolean]("pass"))).toMap

  test("clean prose passes every rule") {
    assert(flags(0L) == ((true, true, true, true, true, true, true, true)))
  }

  test("each crafted violator trips exactly its rule") {
    assert(!flags(1L)._1); assert(!flags(2L)._1)   // word count low/high
    assert(!flags(3L)._2)                          // mean word length
    assert(!flags(4L)._3)                          // symbol ratio
    assert(!flags(5L)._4)                          // bullet lines
    assert(!flags(6L)._5)                          // ellipsis lines
    assert(!flags(7L)._6)                          // alpha ratio
    assert(!flags(8L)._7)                          // required stopwords
    assert((1L to 8L).forall(!flags(_)._8))        // all fail the conjunction
  }

  test("summary attributes failures per rule from one scan") {
    val sm = TextAnalysis.gopherRuleSummary(
        TextAnalysis.gopherRules(docs, minWords = 5, maxWords = 100,
          maxBulletRatio = 0.5))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sm("r_word_count") == 2)
    // docs 4 (hashes) and 6 (ellipses are symbols too, per Gopher)
    assert(sm("r_mean_word_len") >= 1 && sm("r_symbol_ratio") == 2)
    assert(sm("r_bullet_ratio") == 1 && sm("r_ellipsis_ratio") == 1)
    assert(sm("r_alpha_ratio") == 3) // 7 (digits), 4 ('#' words), 5 ('-' words)
    assert(sm.values.sum >= 9) // doc 2 fails multiple rules
  }

  test("battery is one map-side stage: no shuffle in the per-doc plan") {
    val plan = TextAnalysis.gopherRules(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("defaults on the corpus: canonical Gopher thresholds") {
    val r = TextAnalysis.gopherRules(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet"))
    assert(r.filter(col("pass")).count() >= 0) // smoke: evaluates end-to-end
    assert(r.columns.count(_.startsWith("r_")) == 7)
  }
}
