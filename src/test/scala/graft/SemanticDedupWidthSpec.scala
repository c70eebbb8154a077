package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Pins `semantic_dedup_w`'s corpus-scaled cell-count machinery (r18 —
  * the cosine_w treatment applied to the SemDeDup blocking, closing the
  * r17 verdict's #1 item) at the points the committed sf0.01 gate never
  * exercises: every oracle hash run there derives k = 16, so the step
  * boundaries and the k > 16 pipeline need their own pins. The k = 128
  * branch itself is cross-engine hash-checked at sf10
  * (evidence/r18/correctness_sf10_semantic_dedup_w.log). */
class SemanticDedupWidthSpec extends SparkSpec {

  test("corpusScaledNCells: strict-inequality step boundaries") {
    val cases = Seq(
      0L -> 16, 1L -> 16,
      25600L -> 16, 25601L -> 32,        // first step: n > 100·2^8
      51200L -> 32, 51201L -> 64,
      102400L -> 64, 102401L -> 128,
      204800L -> 128, 204801L -> 256,
      2000000L -> 2048,                  // sf100's 2 M vectors
      13107200L -> 8192, 13107201L -> 16384, // last step: n > 100·2^17
      Long.MaxValue -> 16384)            // cap: centroid matrix stays ≤ ~8 MB
    cases.foreach { case (n, expect) =>
      assert(Similarity.corpusScaledNCells(n) === expect, s"k at n=$n")
    }
    // the committed gate SFs stay at the fixed query's k = 16; sf10
    // (200 k vectors) is the first SF where the branches diverge
    assert(Similarity.corpusScaledNCells(500L) === 16)
    assert(Similarity.corpusScaledNCells(2000L) === 16)
    assert(Similarity.corpusScaledNCells(20000L) === 16)
    assert(Similarity.corpusScaledNCells(200000L) === 128)
  }

  test("semanticDedup at k > 16: cell range, verdict consistency, " +
      "partitioning invariance") {
    import spark.implicits._
    // 600 deterministic 8-dim vectors in 3 tight clusters plus spread —
    // small enough to brute-force the verdict, structured enough that
    // cells and dups both occur
    val n = 600
    val dim = 8
    // +1 keeps every vector nonzero (cosine needs norm > 0 — the same
    // contract the real embeddings table satisfies)
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      array((0 until dim).map(i =>
        ((col("id") % 3) * 10 + (col("id") * (i + 1) % 7) + 1).cast("double")): _*)
        .as("embedding"))
    val k = 32
    val out = Similarity.semanticDedup(vecs.toDF(), tau = 0.25,
      nCells = k, iters = 1).cache()
    val rows = out.collect()
    assert(rows.length === n)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < k), "cell range")
    // verdict consistency: dup_of < vec_id, dup_of in the same cell,
    // kept ⇔ dup_of null
    val cellOf = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val kept = r.getBoolean(3)
      if (kept) assert(r.isNullAt(2))
      else {
        val dupOf = r.getLong(2)
        assert(dupOf < r.getLong(0), "keep-lowest-id")
        assert(cellOf(dupOf) === r.getLong(1), "dup_of shares the cell")
      }
    }
    // partitioning invariance: the same corpus through a different
    // partition count yields the identical verdict (centroid means are
    // ROUNDed so summation order cannot leak into the assignment)
    val repart = Similarity.semanticDedup(vecs.repartition(7).toDF(),
      tau = 0.25, nCells = k, iters = 1)
    assert(out.exceptAll(repart).unionAll(repart.exceptAll(out)).count() === 0L)
    out.unpersist()
  }

  test("oracle SQL: _w embeds the dynamic-k seeds, tails are the shared " +
      "generator's") {
    val fixed = SparkEntry.oracleSql("semantic_dedup")
    val scaled = SparkEntry.oracleSql("semantic_dedup_w")
    assert(fixed.contains("LIMIT 16"))
    assert(scaled.contains("16 * (CAST(1 AS BIGINT) << CAST(COUNT(*) AS INT))"))
    assert(scaled.contains("range(1, 11)"))
    // shared tail: both replays end in the identical pair-prune SQL — a
    // hand-edit of either side breaks this pin
    def tail(s: String) = s.substring(s.indexOf("d0 AS"))
    assert(tail(fixed) === tail(scaled))
  }
}
