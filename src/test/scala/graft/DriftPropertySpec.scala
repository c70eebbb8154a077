package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.Drift

/** Property tests for the drift gates: the metric axioms must hold on
  * arbitrary samples, not only the handcrafted DriftSpec cases. Driver
  * sample sizes stay small — each property case runs a Spark job. */
class DriftPropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  private def df(xs: Seq[Double]) = {
    import spark.implicits._
    xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
  }

  private val sample = Gen.nonEmptyListOf(Gen.choose(-50.0, 150.0))
    .map(_.take(40))

  test("KS axioms: D ∈ [0,1], D(a,a) = 0, symmetric in its arguments") {
    check(Prop.forAll(sample, sample) { (a, b) =>
      val ab = Drift.ks(df(a), df(b), "x").collect().head.getAs[Double]("d_stat")
      val ba = Drift.ks(df(b), df(a), "x").collect().head.getAs[Double]("d_stat")
      val aa = Drift.ks(df(a), df(a), "x").collect().head.getAs[Double]("d_stat")
      ab >= 0.0 && ab <= 1.0 && ab == ba && aa == 0.0
    })
  }

  test("PSI axioms: zero on identical samples, non-negative, all bins present") {
    check(Prop.forAll(sample, sample) { (a, b) =>
      val same = Drift.psi(df(a), df(a), "x", lo = -50, hi = 150, bins = 8)
        .collect()
      val diff = Drift.psi(df(a), df(b), "x", lo = -50, hi = 150, bins = 8)
        .collect()
      same.length == 8 && diff.length == 8 &&
        same.forall(_.getAs[Double]("psi") == 0.0) &&
        diff.forall(_.getAs[Double]("psi") >= 0.0) &&
        diff.map(_.getAs[Long]("n_cur")).sum == b.length
    })
  }
}
