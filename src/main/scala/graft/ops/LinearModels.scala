package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed training of linear models — the quality-classifier shape
  * (fastText-style gates, contamination scorers) where the MODEL is tiny
  * but the TRAINING SET is the corpus.
  *
  * Same execution contract as [[LinearAlgebra]] (PCA): each iteration is
  * ONE partial-aggregated pass over the data — the executors reduce
  * d+1 running sums (one per gradient component), only those scalars
  * reach the driver, and the updated weight vector broadcasts back into
  * the next pass as literals. Nothing row-shaped ever funnels through
  * the driver, so the cost per iteration at 100 TB is a single scan +
  * an O(d) reduce, and iteration count is the only multiplier.
  *
  * Determinism policy (the PageRank rule): gradients are rounded to 9 dp
  * BEFORE the weight update and weights to 6 dp after it, so shuffle/
  * addition-order noise and last-ulp libm `exp` differences can never
  * accumulate across iterations — the learned weights are bit-identical
  * on any engine, partitioning, or cluster size, which is what makes the
  * whole training run value-checkable against a DuckDB oracle.
  */
object LinearModels {

  /** Batch-gradient-descent logistic regression.
    *
    * @param df        training frame (already featurized)
    * @param features  (name, column) pairs; a bias term is prepended
    * @param label     0/1 column
    * @param lr        learning rate
    * @param iters     full-batch GD steps
    * @return (feature, weight) rows — 'bias' first in declaration order
    */
  def logisticGd(df: DataFrame, features: Seq[(String, Column)],
      label: Column, lr: Double = 1.0, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val names = "bias" +: features.map(_._1)
    // featurize once, pin it: the GD loop re-reads this frame `iters`
    // times and must not recompute the feature expressions each pass
    val feats = Materialize(df.select(
      (features.map { case (n, c) => c.cast("double").as(n) } :+
        label.cast("double").as("__y")): _*))
    var w = Vector.fill(names.length)(0.0)
    for (_ <- 0 until iters) {
      val margin = names.zipWithIndex.map { case (n, j) =>
        lit(w(j)) * (if (j == 0) lit(1.0) else col(n))
      }.reduce(_ + _)
      val err = lit(1.0) / (lit(1.0) + exp(-margin)) - col("__y")
      val gradAggs = names.zipWithIndex.map { case (n, j) =>
        round(avg(err * (if (j == 0) lit(1.0) else col(n))), 9).as(s"g$j")
      }
      val g = feats.agg(gradAggs.head, gradAggs.tail: _*).head()
      // AVG over zero rows is NULL — treat it as a zero gradient so an
      // empty training frame returns the (deterministic) init weights
      def grad(j: Int): Double = if (g.isNullAt(j)) 0.0 else g.getDouble(j)
      w = w.indices.map(j => BigDecimal(w(j) - lr * grad(j))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toVector
    }
    import spark.implicits._
    names.zip(w).toDF("feature", "weight")
  }
}
