package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Quantified retrieval QUALITY of the approximate ANN paths against
  * brute force on the real test embeddings — the plan-shape specs prove
  * the indexes scale, this one proves they still find things. Recall
  * floors are deliberately below typical observed values (the index
  * structures are deterministic, but the floors should not be brittle
  * to testdata regeneration).
  */
class AnnRecallSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 20)

  /** recall@k of `got` (q_id, c_id) against brute-force top-k. */
  private def recallAt(k: Int, got: Array[(Long, Long)]): Double = {
    val truth = Similarity.bruteForceTopK(queries, emb, k)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.count(truth.contains).toDouble / truth.size
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
    df.select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1)))

  test("IVF nprobe=4 keeps most of the brute-force top-10") {
    val r = recallAt(10, pairs(
      Similarity.ivfTopK(queries, emb, k = 10, nCells = 16, nprobe = 4, iters = 1)))
    info(f"ivf recall@10 = $r%.3f")
    assert(r >= 0.55, f"IVF recall collapsed: $r%.3f")
  }

  test("PQ/ADC recall is honest for its compression and scales with bits") {
    // m=4, codes=16 stores 16 bits/vector — 128× compression of a 64-d
    // float corpus. On these (near-isotropic) embeddings that buys only
    // modest recall; the property worth pinning is that MORE bits buy
    // MORE recall (the knob a deployment actually turns).
    val coarse = recallAt(10, pairs(
      Similarity.pqTopK(queries, emb, k = 10, m = 4, codes = 16, iters = 1)))
    val fine = recallAt(10, pairs(
      Similarity.pqTopK(queries, emb, k = 10, m = 8, codes = 32, iters = 1)))
    info(f"pq recall@10: m=4/codes=16 $coarse%.3f, m=8/codes=32 $fine%.3f")
    // the synthetic embeddings are near-isotropic — PQ's worst case —
    // so the gain is modest; monotone non-degradation is the stable pin
    assert(coarse >= 0.15, f"coarse PQ recall collapsed: $coarse%.3f")
    assert(fine >= coarse,
      f"finer quantization must not LOSE recall: $coarse%.3f -> $fine%.3f")
  }

  test("sign-bucket ANN trades recall for a pure equi-join, but not to zero") {
    val r = recallAt(10, pairs(
      Similarity.bucketedTopK(queries, emb, k = 10, signBits = 4)))
    info(f"bucketed recall@10 = $r%.3f")
    assert(r >= 0.15, f"bucketed recall collapsed: $r%.3f")
  }
}
