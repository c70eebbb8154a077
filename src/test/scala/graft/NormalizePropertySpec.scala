package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.TextAnalysis

/** Property tests for the normalization/boilerplate cleanup chain. The
  * load-bearing invariant is IDEMPOTENCE: curation stages re-run on
  * already-curated data (incremental ingest, crash replay), so a second
  * pass must be a no-op — a stage that keeps changing its own output
  * corrupts every downstream fingerprint on replay. */
class NormalizePropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  // words + accents (composed AND decomposed) + controls + messy whitespace
  private val junkChar: Gen[String] = Gen.oneOf(
    "a", "b", "z", "9", ".", "!", "e\u0301", "\u00e9", "n\u0303",
    " ", "  ", "\t", "\n", "\u0007", "\u000b", "\u007f")
  private val junkText: Gen[String] =
    Gen.listOf(junkChar).map(_.mkString)

  private def normalizeAll(texts: Seq[String]): Seq[String] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("n"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
  }

  test("normalizeText is idempotent and leaves only NFC text, single spaces") {
    check(Prop.forAll(Gen.listOfN(8, junkText)) { texts =>
      val once = normalizeAll(texts)
      val twice = normalizeAll(once)
      once == twice &&
        once.forall { s =>
          java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC) &&
            !s.contains("  ") && !s.exists(c => c < ' ' || c == '\u007f') &&
            s == s.trim
        }
    })
  }

  test("boilerplateFilter is idempotent: kept lines survive a second pass") {
    import spark.implicits._
    val lineGen = for {
      n <- Gen.choose(0, 9)
      punct <- Gen.oneOf(".", "!", "?", "", " ")
    } yield (1 to n).map(i => s"w$i").mkString(" ") + punct
    val docGen = Gen.listOf(lineGen).map(_.mkString("\n"))
    check(Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = TextAnalysis.boilerplateFilter(df)
        .orderBy("doc_id").collect()
      val df2 = once.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("clean_text"))).toSeq.toDF("doc_id", "text")
      val twice = TextAnalysis.boilerplateFilter(df2)
        .orderBy("doc_id").collect()
      once.zip(twice).forall { case (a, b) =>
        // pass 2 keeps EVERY line pass 1 kept, unchanged
        a.getAs[String]("clean_text") == b.getAs[String]("clean_text") &&
          b.getAs[Long]("n_kept") == a.getAs[Long]("n_kept")
      }
    })
  }
}
