package graft

import org.apache.spark.sql.functions._
import graft.ops.LinearAlgebra

/** PCA: eigensolver correctness, orthonormal components, dominant
  * direction recovery, and map-only projection consistency. */
class LinearAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("jacobi recovers a known symmetric eigensystem") {
    // [[2,1],[1,2]] → eigenvalues 3 (v=(1,1)/√2) and 1 (v=(1,-1)/√2)
    val (evals, evecs) = LinearAlgebra.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = evals.indices.map(i => evals(i) -> Array(evecs(0)(i), evecs(1)(i)))
      .sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-9)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-9)
    val v0 = pairs(0)._2
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(v0(0) - v0(1)) < 1e-9) // same sign components
  }

  test("PCA finds the dominant direction of anisotropic data") {
    // points along direction (3,4)/5 in 4-d (dims 2,3 are small noise),
    // deterministic "noise" from the index
    val dir = Array(0.6, 0.8, 0.0, 0.0)
    val data = (0 until 200).map { i =>
      val tt = (i % 41) - 20.0 // spread −20..20
      val n1 = ((i * 7) % 5 - 2) * 0.01
      val n2 = ((i * 13) % 7 - 3) * 0.01
      (i.toLong, Seq(tt * dir(0) + 5.0, tt * dir(1) - 3.0, n1, n2))
    }.toDF("vec_id", "embedding")
    val m = LinearAlgebra.fitPca(data, "embedding", k = 2)
    assert(m.n == 200)
    assert(math.abs(m.means(0) - 5.0) < 0.5 && math.abs(m.means(1) + 3.0) < 0.5)
    // top component ≈ ±dir
    val c0 = m.components(0)
    assert(math.abs(math.abs(dot(c0, dir)) - 1.0) < 1e-3, c0.toSeq)
    // eigenvalue dominance and ordering
    assert(m.eigenvalues(0) > 100 * m.eigenvalues(1))
    assert(m.explainedVariance(0) > 0.99)
    // orthonormality of returned components
    assert(math.abs(dot(c0, c0) - 1.0) < 1e-9)
    assert(math.abs(dot(c0, m.components(1))) < 1e-9)
  }

  test("projection matches the driver-side formula and stays map-only") {
    val data = (0 until 50).map { i =>
      (i.toLong, Seq(i * 0.1, 1.0 - i * 0.05, (i % 3).toDouble))
    }.toDF("vec_id", "embedding")
    val m = LinearAlgebra.fitPca(data, "embedding", k = 2)
    val proj = LinearAlgebra.project(data, m, "embedding")
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "projection must not shuffle")
    val rows = proj.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Double]]("pca")).toMap
    val raw = data.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Double]]("embedding")).toMap
    raw.foreach { case (id, emb) =>
      val centered = emb.toArray.zip(m.means).map { case (x, mu) => x - mu }
      m.components.zipWithIndex.foreach { case (comp, j) =>
        assert(math.abs(rows(id)(j) - dot(centered, comp)) < 1e-9,
          s"vec $id comp $j")
      }
    }
  }
}
