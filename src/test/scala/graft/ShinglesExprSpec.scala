package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.ShinglesExpr

/** ShinglesExpr equivalence: the native expression must agree, element
  * for element, with the declarative formulation it replaced
  * (`array_distinct(transform(sequence...))` for shingle semantics; the
  * guarded transform for n-gram semantics) on arbitrary token arrays —
  * including the k > n, n = 0, duplicate-token, and empty-token edges —
  * and its interpreted (nullSafeEval) and codegen paths must agree with
  * each other. */
class ShinglesExprSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  private val token: Gen[String] =
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(4)), Gen.const(""), Gen.const("a"))
  private val tokensGen: Gen[List[String]] = Gen.listOfN(12, token).map(_.take(12))

  private def declarativeShingles(t: org.apache.spark.sql.Column, k: Int) =
    array_distinct(transform(
      sequence(lit(0), greatest(size(t) - k, lit(0))),
      i => concat_ws(" ", slice(t, i + 1, lit(k)))))

  private def declarativeNgrams(t: org.apache.spark.sql.Column, n: Int, distinct: Boolean) = {
    val grams = transform(sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", slice(t, i, lit(n))))
    when(size(t) >= n, if (distinct) array_distinct(grams) else grams)
      .otherwise(array().cast("array<string>"))
  }

  test("shingle semantics match the declarative form on random token arrays") {
    import spark.implicits._
    val gen = for {
      rows <- Gen.listOfN(30, tokensGen)
      k <- Gen.choose(1, 5)
    } yield (rows, k)
    check(Prop.forAll(gen) { case (rows, k) =>
      val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      df.select(col("id"),
          ShinglesExpr.shingles(col("t"), k).as("a"),
          declarativeShingles(col("t"), k).as("b"))
        .collect()
        .forall(r => r.getSeq[String](1) == r.getSeq[String](2))
    })
  }

  test("ngram semantics match the declarative form (distinct and multiset)") {
    import spark.implicits._
    val gen = for {
      rows <- Gen.listOfN(30, tokensGen)
      n <- Gen.choose(1, 4)
      distinct <- Gen.oneOf(true, false)
    } yield (rows, n, distinct)
    check(Prop.forAll(gen) { case (rows, n, distinct) =>
      val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      df.select(col("id"),
          ShinglesExpr.ngrams(col("t"), n, distinct).as("a"),
          declarativeNgrams(col("t"), n, distinct).as("b"))
        .collect()
        .forall(r => r.getSeq[String](1) == r.getSeq[String](2))
    })
  }

  test("interpreted path agrees with codegen path") {
    import spark.implicits._
    val rows = Seq(
      Seq("a", "b", "c", "d"), Seq("a", "a", "a"), Seq("x"), Seq.empty[String],
      Seq("", "", ""), Seq("one", "two", "one", "two", "one"))
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    // whole-stage codegen result
    val gen = df.select(col("id"), ShinglesExpr.shingles(col("t"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // interpreted: evaluate the static helper directly
    rows.zipWithIndex.foreach { case (t, i) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        t.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      val interp = ShinglesExpr.shingle(arr, 3, distinct = true, shortWhole = true)
      val strs = (0 until interp.numElements())
        .map(j => interp.getUTF8String(j).toString)
      assert(strs == gen(i.toLong), s"interp/codegen split on row $i")
    }
  }

  test("null token array: shingles null, explode drops, explode_outer keeps one row") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq("a", "b"))), (2L, None))
      .toDF("id", "t")
    val out = df.select(col("id"), ShinglesExpr.ngrams(col("t"), 2, distinct = false).as("g"))
    assert(out.filter(col("id") === 2 && col("g").isNull).count() == 1)
    assert(out.select(col("id"), explode(col("g"))).filter(col("id") === 2).count() == 0)
    assert(out.select(col("id"), explode_outer(col("g"))).filter(col("id") === 2).count() == 1)
  }
}
