package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over embedding columns — PCA for
  * whitening / dimensionality reduction ahead of ANN or quantization
  * (the OPQ-style preprocessing step of a vector pipeline).
  *
  * Scale design: the only thing that crosses the wire is one
  * (d + d²/2 + 1)-double accumulator PER PARTITION — count, per-dimension
  * sums, and the upper triangle of Σ x xᵀ, built imperatively inside
  * `mapPartitions` (this is the "genuine per-partition imperative logic"
  * case where an RDD fold beats any DataFrame formulation: a d×d gram as
  * column expressions would explode to d² aggregate columns). The d×d
  * eigenproblem is solved on the driver with cyclic Jacobi — for
  * embedding dims (64–4096) that is microseconds and exact enough.
  *
  * Float-sum caveat: partial sums combine per partition, so the last
  * bits of the covariance depend on the partitioning — PCA is exposed as
  * a library op + spec-pinned properties (orthonormality, eigen
  * residuals, variance ordering), not as a hash-compared declared query.
  */
object LinearAlgebra {

  /** Eigenpairs of the sample covariance of `embCol`, descending by
    * eigenvalue: (means, eigenvalues, eigenvectors-as-rows, n). */
  case class PcaModel(means: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]], n: Long) {
    def explainedVariance: Array[Double] = {
      val tot = eigenvalues.sum
      eigenvalues.map(v => if (tot > 0) v / tot else 0.0)
    }
  }

  /** Fit PCA: one pass, one accumulator per partition to the driver. */
  def fitPca(df: DataFrame, embCol: String, k: Int): PcaModel = {
    val rdd = df.select(col(embCol).cast("array<double>")).rdd
      .map(_.getAs[scala.collection.Seq[Double]](0))
    val parts = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var d = -1
      var sums: Array[Double] = null
      var gram: Array[Double] = null // upper triangle, row-major
      it.foreach { v =>
        if (d < 0) {
          d = v.length
          sums = new Array[Double](d)
          gram = new Array[Double](d * (d + 1) / 2)
        }
        n += 1
        var i = 0
        var t = 0
        while (i < d) {
          val xi = v(i)
          sums(i) += xi
          var j = i
          while (j < d) {
            gram(t) += xi * v(j); t += 1; j += 1
          }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single((pid, n, sums, gram))
    }.collect().sortBy(_._1) // fixed combine order on the driver
    require(parts.nonEmpty, "fitPca: empty input")
    val d = parts.head._3.length
    val n = parts.map(_._2).sum
    require(n > 1, "fitPca: need at least 2 rows")
    val sums = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2)
    parts.foreach { case (_, _, s, g) =>
      var i = 0
      while (i < d) { sums(i) += s(i); i += 1 }
      var t = 0
      while (t < gram.length) { gram(t) += g(t); t += 1 }
    }
    val means = sums.map(_ / n)
    // covariance = (Σxxᵀ − n·μμᵀ) / (n−1), symmetrized from the triangle
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (gram(t) - n * means(i) * means(j)) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    PcaModel(means, order.map(evals).toArray,
      order.map(i => evecs.map(_(i))).toArray, n)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix with eigenvectors as COLUMNS). Deterministic:
    * fixed sweep order, fixed iteration count bound. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      sweeps: Int = 30, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(tt * tt + 1)
            val s = tt * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Map-only projection of `embCol` onto the model's components:
    * appends `outCol` = array of k scores dot(x − μ, vⱼ), computed as
    * codegen'd VecDot against literal components minus a folded-in
    * constant (dot(μ, vⱼ)) — no shuffle, no UDF. */
  def project(df: DataFrame, model: PcaModel, embCol: String,
      outCol: String = "pca"): DataFrame = {
    val scores = model.components.map { comp =>
      val mu = model.means.zip(comp).map { case (m, c) => m * c }.sum
      graft.functions.VectorExprs.dot(
        col(embCol).cast("array<double>"), typedlit(comp.toSeq)) - lit(mu)
    }
    df.withColumn(outCol, array(scores.map(s => s: Column): _*))
  }
}
