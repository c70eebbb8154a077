package graft

import org.apache.spark.sql.functions._
import graft.functions.WsSplitExpr

/** The native whitespace splitter must be BIT-IDENTICAL to
  * `split(c, "\\s+")` — every text query's oracle was written against
  * the regex semantics, so any divergence is silent corruption. */
class WsSplitSpec extends SparkSpec {
  import spark.implicits._

  private def both(ss: Seq[String]): Seq[(Seq[String], Seq[String])] =
    ss.toDF("s").select(
        split(col("s"), "\\s+").as("re"),
        WsSplitExpr.wsSplit(col("s")).as("ws"))
      .collect().map(r => (r.getSeq[String](0), r.getSeq[String](1))).toSeq

  test("edge cases match java split(_, \\s+, -1) exactly") {
    val cases = Seq(
      "a b c", " a b", "a b ", "  a  b  ", "", " ", "\t", "a\tb\nc\rd\fe",
      "ab", "one", "\n\n", "a  b", "café niño", // multibyte
      "世界 hello 世界", "é combining", "a b")
    // NB: U+00A0 (nbsp) is NOT \s in Java or RE2 — must stay one token
    for ((re, ws) <- both(cases)) assert(re == ws, s"re=$re ws=$ws")
  }

  test("random strings over a whitespace-heavy alphabet agree") {
    val rnd = new scala.util.Random(42)
    val alpha = "ab \t\n\r\fé世"
    val cases = (0 until 500).map(_ =>
      (0 until rnd.nextInt(30)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    for ((re, ws) <- both(cases)) assert(re == ws, s"re=$re ws=$ws")
  }

  test("interpreted path (no codegen) agrees too") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString(" a\t\tb c ")
    val got = WsSplitExpr.split(s)
    assert((0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      == Seq("", "a", "b", "c", ""))
  }
}
