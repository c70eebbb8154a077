package graft

import graft.ops.TextAnalysis

/** Flesch reading ease with the vowel-group syllable proxy. */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("counts and score match a hand computation") {
    val docs = Seq(
      (0L, "The cat sat. The dog ran!"),
      (1L, "Incomprehensibility notwithstanding, perspicacious individuals persevere."))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    // doc 0: 6 words, 2 sentences, syllables: the=1 cat=1 sat.=1 dog=1
    // ran!=1 (second 'the'=1) → 6
    assert(got(0) == ((0L, 6L, 2L, 6L,
      BigDecimal(206.835 - 1.015 * 6 / 2.0 - 84.6 * 6 / 6.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // doc 1: long latinate words → many syllables, low (negative) score
    val (_, w1, s1, sy1, f1) = got(1)
    assert(w1 == 5L && s1 == 1L && sy1 >= 20L && f1 < 0.0)
  }

  test("pathological doc beyond the integer-exact bound takes the " +
      "double fallback instead of overflowing") {
    // 700k one-syllable words, one sentence: n_words > 600000 violates
    // the exactness precondition (1015·w²·10 would pass 2^53), so the
    // guard must route to the double form — same value the formula gives
    val big = ("a " * 700000).trim
    val got = TextAnalysis.readability(Seq((0L, big)).toDF("doc_id", "text"))
      .collect().head
    val w = got.getAs[Long]("n_words")
    assert(w == 700000L && got.getAs[Long]("n_sentences") == 1L)
    val expected = math.rint(
      (206835.0 / 1000.0 - 1015.0 / 1000.0 * w / 1.0
        - 846.0 / 10.0 * got.getAs[Long]("n_syllables").toDouble / w)
        * 10000.0) / 10000.0
    val f = got.getAs[Double]("flesch")
    assert(!f.isNaN && !f.isInfinite)
    assert(math.abs(f - expected) < 1e-9, s"$f vs $expected")
  }

  test("simple prose scores higher than dense prose") {
    val docs = Seq(
      (0L, "I like to eat. You like to play. We all have fun."),
      (1L, "Multidimensional organizational heterogeneity complicates interdepartmental prioritization methodologies."))
      .toDF("doc_id", "text")
    val f = TextAnalysis.readability(docs).orderBy("doc_id")
      .collect().map(_.getAs[Double]("flesch"))
    assert(f(0) > 80 && f(1) < 0 && f(0) > f(1))
  }
}
