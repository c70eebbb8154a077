package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Curation chain: every drop_reason leg fires, precedence holds. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("drop reasons: quality, language, duplicate, kept — with precedence") {
    val en = "fast scan with slow merge fast sort with wide table " +
      "fast plan slow runs with stable sort data rows the merge" // 21 toks, 1 stopword
    val d = docs(
      1L -> en,                               // kept (keeper of the dup pair)
      2L -> "too short",                      // quality (n_tokens < 20)
      3L -> ("el valor de la tabla y los datos que vienen del plan " +
        "para la consulta grande de hoy con los datos nuevos"), // language (es)
      4L -> en,                               // duplicate of 1
      5L -> ("le plan de la table et les données qui viennent du tri " +
        "avec les données stables du jour et les plans larges"))  // language (fr)
    val got = TextAnalysis.curate(d, langs = Seq("en"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains("quality"))
    assert(got(3L).contains("language"))
    assert(got(4L).contains("duplicate"))
    assert(got(5L).contains("language"))
    // precedence: a doc failing quality AND language reports quality
    val both = TextAnalysis.curate(docs(9L -> "le tri"), langs = Seq("en"))
      .collect().head
    assert(both.getString(3) == "quality")
  }

  test("dedup ties break to the lowest doc_id among survivors only") {
    val en = "fast scan with slow merge fast sort with wide table " +
      "fast plan slow runs with stable sort data rows the merge"
    // doc 1 fails quality → doc 3 becomes the keeper of the dup group
    val d = docs(1L -> "short", 3L -> en, 8L -> en)
    val got = TextAnalysis.curate(d, langs = Seq("en"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got(3L).isEmpty && got(8L).contains("duplicate"))
  }

  test("PII: emails and phones counted and redacted; clean text untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org or +56 9 1234 5678 thanks"),
      (2L, "two mails a@b.io c.d@e.museum and a number (02) 2345 6789 end"),
      (3L, "no contact info here, just words and the number 42")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.piiFeatures(docs)
      .select("doc_id", "n_emails", "n_phones", "has_pii", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getBoolean(3), r.getString(4))).toMap
    assert(got(1L)._1 == 1 && got(1L)._2 == 1 && got(1L)._3)
    assert(got(1L)._4 == "reach me at [EMAIL] or [PHONE] thanks")
    assert(got(2L)._1 == 2 && got(2L)._2 == 1 && got(2L)._3)
    assert(got(3L) == (0, 0, false, "no contact info here, just words and the number 42"))
  }

  test("chunking: window/stride boundaries, short and exact-fit docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "a b c d e"),                               // short: 1 chunk of 5
      (3L, (1 to 10).map(i => s"t$i").mkString(" ")))  // exact fit: 1 chunk
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.chunk(docs, window = 10, stride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    val d1 = got.filter(_._1 == 1L)
    // last start = ceil((100-10)/8) = 12 → 13 chunks; tail chunk holds 4
    assert(d1.length == 13 && d1.last._3 == 4L)
    assert(d1.init.forall(_._3 == 10L))
    // stride 8 < window 10: consecutive chunks overlap by 2 tokens
    assert(d1(0)._4.split(" ").takeRight(2).toSeq ==
      d1(1)._4.split(" ").take(2).toSeq)
    assert(got.filter(_._1 == 2L).map(c => (c._2, c._3)).toSeq == Seq((0L, 5L)))
    assert(got.filter(_._1 == 3L).map(c => (c._2, c._3)).toSeq == Seq((0L, 10L)))
  }

  test("EWMA: seeded with first value, folds in event order, per key") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ev = Seq(
      (1L, 1L, t(0), 10.0), (1L, 2L, t(1), 20.0), (1L, 3L, t(2), 0.0),
      (2L, 4L, t(0), 5.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = graft.ops.TimeSeries.ewma(ev, "user_id", "ts", "event_id", "value", 0.5)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("ewma"))).toMap
    // s1=10, s2=.5*20+.5*10=15, s3=.5*0+.5*15=7.5
    assert(got(1L) == (3L, 7.5))
    assert(got(2L) == (1L, 5.0)) // singleton: the seed itself
  }

  test("splitDecontaminated flags a planted train→eval leak") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val secret = "zq wv xj kq vz bn mm pq rs tu" // a unique 10-token span
    // enough docs that the 80/20 hash split puts some on each side
    val base = (0L until 40L).map(i =>
      (i, (0 until 12).map(j => s"w${i}x$j").mkString(" "))) // no shared grams
    val docs = base.map { case (id, t) =>
      // plant the secret span in doc 0 and doc 1 — the hash split will
      // decide their sides; assert on whatever sides they land
      if (id <= 1) (id, s"$t $secret") else (id, t)
    }.toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.splitDecontaminated(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
    val side0 = out(0L)._1; val side1 = out(1L)._1
    if (side0 != side1) {
      // one holds the secret in eval, the other trains on it → flagged
      val trainId = if (side0 == "train") 0L else 1L
      assert(out(trainId)._2 > 0 && !out(trainId)._3,
        s"leaked doc $trainId should be dropped: ${out(trainId)}")
    }
    // eval rows always keep; clean train rows keep
    assert(out.values.filter(_._1 == "val").forall(_._3))
    assert(out.filterNot(kv => kv._1 <= 1).values.forall(_._3))
  }
}
