package graft

import org.apache.spark.sql.functions._
import graft.ops.LinearModels

/** Distributed batch-GD logistic regression: learning direction,
  * bit-stable determinism, and the scalars-only driver contract. */
class LinearModelsSpec extends SparkSpec {
  import spark.implicits._

  // y = 1 iff x > 0, perfectly separable on one feature
  private def toy = (-100 until 100).map(i =>
    (i / 50.0, if (i >= 0) 1.0 else 0.0)).toDF("x", "y")

  test("learns the separating direction; bias starts at zero") {
    val w = LinearModels.logisticGd(toy, Seq("x" -> col("x")), col("y"),
        lr = 1.0, iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("x") > 0.5, s"feature weight should be strongly positive: $w")
    assert(math.abs(w("bias")) < w("x"), s"bias must not dominate: $w")
    // more steps, lower loss proxy: longer training grows the margin
    val w2 = LinearModels.logisticGd(toy, Seq("x" -> col("x")), col("y"),
        lr = 1.0, iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w2("x") > w("x"))
  }

  test("training is bit-identical under any partitioning") {
    def run(parts: Int) = LinearModels.logisticGd(
        toy.repartition(parts), Seq("x" -> col("x")), col("y"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run(1) == run(13))
  }

  test("zero iterations returns the zero model (shape contract)") {
    val w = LinearModels.logisticGd(toy, Seq("x" -> col("x")), col("y"),
        iters = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w == Map("bias" -> 0.0, "x" -> 0.0))
  }
}
