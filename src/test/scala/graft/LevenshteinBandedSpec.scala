package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.functions.{LevDp, LevenshteinBanded}

/** LevDp must be indistinguishable from Spark's thresholded
  * levenshtein — the banded ASCII fast path is an optimization, never a
  * semantics change. */
class LevenshteinBandedSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  private def builtin(a: String, b: String, k: Int): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b), k)

  private def banded(a: String, b: String, k: Int): Int =
    LevDp.dist(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("property: ASCII strings match the builtin for every threshold") {
    val ascii = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ Seq(' ', '#'))).map(_.mkString))
    check(Prop.forAll(ascii, ascii, Gen.chooseNum(0, 6)) { (a, b, k) =>
      banded(a, b, k) == builtin(a, b, k)
    })
  }

  test("property: non-ASCII falls back to the builtin (codepoint distance)") {
    val uni = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'é', 'ñ', '→', '字')).map(_.mkString))
    check(Prop.forAll(uni, uni, Gen.chooseNum(-1, 4)) { (a, b, k) =>
      banded(a, b, k) == builtin(a, b, k)
    })
  }

  test("property: long strings, wide thresholds — band boundaries + early abandon") {
    val long = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', ' ')).map(_.mkString))
    check(Prop.forAll(long, long, Gen.chooseNum(0, 70)) { (a, b, k) =>
      banded(a, b, k) == builtin(a, b, k)
    })
  }

  test("edges: empties, equals, just-over-threshold, k=0") {
    assert(banded("", "", 3) === 0)
    assert(banded("", "abc", 3) === 3)
    assert(banded("", "abcd", 3) === -1)
    assert(banded("same", "same", 0) === 0)
    assert(banded("kitten", "sitting", 3) === 3)
    assert(banded("kitten", "sitting", 2) === -1)
    assert(banded("abcdefgh", "abcdefgh", 0) === 0)
    assert(banded("abcdefgh", "xbcdefgh", 0) === -1)
  }

  test("expression: codegen column equals the builtin column") {
    val df = spark.createDataFrame(Seq(
      (1L, "linen powder chocolate navajo", "linen powder chocolate navy"),
      (2L, "red green blue", "completely different words"),
      (3L, "café olé", "cafe ole"),
      (4L, "", "abc"))).toDF("id", "a", "b")
    val out = df.select(col("id"),
      LevenshteinBanded(col("a"), col("b"), 3).as("fast"),
      levenshtein(col("a"), col("b"), 3).as("ref")).collect()
    out.foreach(r => assert(r.getInt(1) === r.getInt(2), r.toString))
  }
}
