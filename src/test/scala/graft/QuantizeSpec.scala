package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Int8 quantization: error bounds, code range, degenerate vectors,
  * map-only plan. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
    (1L, Array(-2.0f, 2.0f, 0.0f, 1.0f)),
    (2L, Array(1e-5f, -1e-5f, 2e-5f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // degenerate: all-zero
    .toDF("vec_id", "embedding")

  test("per-dimension error is bounded by scale/2 and codes stay in int8") {
    val rows = Similarity.quantizeInt8(vecs).collect()
    for (r <- rows) {
      val scale = r.getAs[Double]("scale")
      val codes = r.getAs[String]("codes").split(" ").map(_.toInt)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // mse ≤ (scale/2)² when no clamping occurs (max|x| maps to ±127)
      assert(r.getAs[Double]("mse") <= scale * scale / 4 + 1e-12)
    }
  }

  test("reconstruction preserves direction for non-degenerate vectors") {
    val byId = Similarity.quantizeInt8(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(byId(0L).getAs[Double]("cos_recon") > 0.999)
    assert(byId(1L).getAs[Double]("cos_recon") > 0.999)
    // all-zero vector: codes all zero, guarded scale, cos undefined → NaN ok
    assert(byId(3L).getAs[String]("codes").split(" ").forall(_ == "0"))
  }

  test("quantization on the corpus keeps cosine ≥ 0.99 for every vector") {
    val q = Similarity.quantizeInt8(
      spark.read.parquet(sf("sf0.001") + "/embeddings.parquet"))
    assert(q.filter(col("cos_recon") < 0.99).count() == 0)
  }

  test("map-only: no Exchange in the plan") {
    val plan = Similarity.quantizeInt8(vecs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
