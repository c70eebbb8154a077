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
}
