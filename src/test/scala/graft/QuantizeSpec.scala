package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.Similarity

/** Pins [[graft.functions.QuantizeInt8Expr]] — the one-pass native int8
  * quantizer — bit-identical to the declarative HOF chain it replaced
  * ([[Similarity.quantizeInt8Declarative]], the oracle semantics
  * verbatim). The generator hits the numeric edges: all-zero vectors
  * (cos_recon NULL via the norm guard), sub-1e-12 magnitudes (the scale
  * floor), round-half boundaries (.5 quantization ties), ±values at the
  * ±127 clamp, mixed magnitudes, and the empty vector (scale floor,
  * NaN mse from 0/0). */
class QuantizeSpec extends SparkSpec {

  private def check(p: Prop, min: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  private val element: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-3.0, 3.0),
    Gen.oneOf(0.0, -0.0, 1e-13, -1e-13, 0.5, -0.5, 1.5, 2.5, -2.5,
      127.0, -127.0, 300.0, -300.0, 63.5, -63.5),
    Gen.chooseNum(-1e6, 1e6))

  // no empty vectors: the declarative mse divides by size(e), which under
  // ANSI throws DIVIDE_BY_ZERO — embeddings are dense non-empty by schema
  // contract, so the equivalence domain is non-empty arrays
  private val vectors: Gen[List[Double]] = Gen.frequency(
    8 -> Gen.chooseNum(1, 64).flatMap(Gen.listOfN(_, element)),
    1 -> Gen.const(List.fill(8)(0.0)))

  test("quantize_int8 ≡ declarative HOF chain (property)") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(30, vectors)) { vecs: List[List[Double]] =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      val native = Similarity.quantizeInt8(df)
      val decl = Similarity.quantizeInt8Declarative(df)
      val diff = native.exceptAll(decl).unionAll(decl.exceptAll(native))
      val bad = diff.collect()
      if (bad.nonEmpty)
        println(s"quantize drift on: ${bad.take(5).mkString("; ")}")
      bad.isEmpty
    }, min = 12)
  }

  test("spot values: zero vector and clamp") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)),            // zero: scale floor, cos NULL
      (1L, Seq(254.0f, -2.0f, 1.0f)))   // scale 2: codes 127 -1 1 (wait: clamp)
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).orderBy("vec_id").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("cos_recon")))
    assert(got(0).getString(got(0).fieldIndex("codes")) === "0 0")
    assert(got(1).getString(got(1).fieldIndex("codes")) === "127 -1 1")
  }
}
