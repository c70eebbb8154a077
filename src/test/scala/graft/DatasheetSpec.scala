package graft

import org.apache.spark.sql.functions._

import graft.ops.Profiler

/** Per-source datasheet: exact ratios, corpus-wide dup detection, and
  * the text-drops-before-shuffle plan property. */
class DatasheetSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the shared text", "en", "a"),
    (1L, "the shared text", "en", "b"),   // cross-source duplicate of 0
    (2L, "one of a kind words", "en", "a"),
    (3L, "otro texto distinto aqui", "es", "a"),
    (4L, "more singular content", "en", "b"))
    .toDF("doc_id", "text", "lang", "source")

  test("volume, dup, and language ratios are exact per source") {
    val got = Profiler.corpusDatasheet(docs,
        graft.ops.TextAnalysis.tokenCount(col("text")) >= 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("pass_ratio"),
          r.getAs[Double]("dup_ratio"), r.getAs[Double]("en_ratio"))).toMap
    // source a: 3 docs, 3+5+4 tokens; doc 0 dup (matches doc 1 in b);
    // pass (>=4 toks): docs 2,3 → 2/3; en: docs 0,2 → 2/3
    assert(got("a") == ((3L, 12L, 0.6667, 0.3333, 0.6667)))
    // source b: 2 docs; doc 1 dup; pass: doc 1 fails (3 toks), doc 4 fails
    // (3 toks) → 0; en 2/2
    assert(got("b") == ((2L, 6L, 0.0, 0.5, 1.0)))
  }

  test("the duplicate flag sees across sources, not within one") {
    val only = Profiler.corpusDatasheet(docs.filter($"source" === "a"),
      lit(true))
    assert(only.collect().head.getAs[Double]("dup_ratio") == 0.0)
  }

  test("text never reaches a shuffle: exchanges carry only compact columns") {
    val df = Profiler.corpusDatasheet(docs, lit(true))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // every Exchange line lists its partitioning + output; the raw text
    // column must not appear in any of them (md5/token/len only)
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange")).toSeq
    assert(exchangeLines.nonEmpty)
    assert(exchangeLines.forall(!_.contains("text#")))
  }
}
