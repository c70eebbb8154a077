package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift

/** PSI drift monitoring: bin clamping, empty-bin spine, and the headline
  * number against a hand-computed value. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def vals(xs: Double*) = xs.zipWithIndex
    .map { case (x, i) => (i.toLong, x) }.toDF("id", "x")

  test("identical distributions score ~zero PSI; all bins present") {
    val ref = vals(5, 15, 25, 35, 45, 55, 65, 75, 85, 95)
    val out = Drift.psi(ref, ref, "x", lo = 0, hi = 100, bins = 10)
      .orderBy("bin").collect()
    assert(out.length == 10) // spine: every bin reported
    assert(out.forall(_.getAs[Double]("psi") == 0.0))
    assert(out.forall(r => r.getAs[Long]("n_ref") == r.getAs[Long]("n_cur")))
  }

  test("outliers clamp into the edge bins instead of vanishing") {
    val ref = vals(-50, 20, 999)    // below lo and above hi
    val out = Drift.psi(ref, ref, "x", lo = 0, hi = 100, bins = 10)
      .orderBy("bin").collect()
    val counts = out.map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_ref")).toMap
    assert(counts(0L) == 1L) // -50 clamped up
    assert(counts(9L) == 1L) // 999 clamped down
    assert(counts(2L) == 1L)
    assert(counts.values.sum == 3L) // nothing lost
  }

  test("KS: identical samples score 0; disjoint samples score 1") {
    val a = vals(1, 2, 3, 4, 5)
    assert(Drift.ks(a, a, "x").collect().head.getAs[Double]("d_stat") == 0.0)
    val b = vals(10, 11, 12)
    val r = Drift.ks(a, b, "x").collect().head
    assert(r.getAs[Double]("d_stat") == 1.0)
    assert(r.getAs[Long]("n_ref") == 5L && r.getAs[Long]("n_cur") == 3L)
  }

  test("KS matches the hand formula on a partial shift") {
    // ref: {1,2,3,4}, cur: {3,4,5,6} → max gap at v=2: |2/4 - 0/4| = 0.5
    val r = Drift.ks(vals(1, 2, 3, 4), vals(3, 4, 5, 6), "x").collect().head
    assert(r.getAs[Double]("d_stat") == 0.5)
  }

  test("KS is partitioning-invariant (two-phase CDF, no global window)") {
    // the r11 fix: the cumulative sums come from range-repartition +
    // per-partition offsets, so the statistic must be bit-identical
    // under any input partitioning — including one row per partition
    val ref = vals(1, 1, 2, 3, 5, 8, 13, 21, 34, 55)
    val cur = vals(2, 3, 5, 7, 11, 13, 17, 19, 23, 29)
    val base = Drift.ks(ref, cur, "x").collect().head
    for (p <- Seq(1, 3, 10)) {
      val r = Drift.ks(ref.repartition(p), cur.repartition(p), "x")
        .collect().head
      assert(r.getAs[Double]("d_stat") == base.getAs[Double]("d_stat"))
      assert(r.getAs[Long]("n_ref") == 10L && r.getAs[Long]("n_cur") == 10L)
    }
    // and the plan really has no partition-less window: the analyzed
    // plan must contain zero Window nodes at all
    val plan = Drift.ks(ref, cur, "x").queryExecution.analyzed
    assert(plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty)
  }

  test("ks releases every persisted block before returning (monitor-loop " +
      "safe)") {
    // r12 ADVICE: the pinned partitioning previously lived until the
    // returned frame was GC'd — a per-micro-batch monitoring loop
    // accumulated persisted RDDs. ks is eager now and must leave the
    // persistence registry exactly as it found it.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r = Drift.ks(vals(1, 2, 3, 4), vals(3, 4, 5, 6), "x")
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"ks leaked persisted RDDs: ${after -- before}")
    // and the result is already local: consuming it runs no further jobs
    assert(r.collect().length == 1)
  }

  test("KS empty side reports quiet (d_stat 0, never NaN) and stays leak-free") {
    // the eager contract markets ks for per-micro-batch monitoring loops
    // where an empty batch is the COMMON case; without the guard 0/0
    // CDF ratios make d_stat NaN — and NaN > threshold alarms (r13
    // ADVICE). Mirrors the psi empty-side contract.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r1 = Drift.ks(vals(1, 2, 3), vals(), "x").collect().head
    assert(r1.getAs[Double]("d_stat") == 0.0)
    assert(r1.getAs[Long]("n_ref") == 3L && r1.getAs[Long]("n_cur") == 0L)
    val r2 = Drift.ks(vals(), vals(1, 2), "x").collect().head
    assert(r2.getAs[Double]("d_stat") == 0.0)
    assert(r2.getAs[Long]("n_ref") == 0L && r2.getAs[Long]("n_cur") == 2L)
    assert(Drift.ks(vals(), vals(), "x").collect()
      .head.getAs[Double]("d_stat") == 0.0)
    // the guard path short-circuits before phase 2 — it must still unpin
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("ks unpins even when the job fails (finally, not success-path-only)") {
    // r13 ADVICE: a monitoring loop that retries on transient job
    // failures must not accumulate pinned blocks — the unpersist sits in
    // a finally, so a throwing collect() leaves the registry untouched
    val boom = udf((d: Double) =>
      if (d > 2) throw new RuntimeException("boom") else d)
    val bad = vals(1, 2, 3, 4).select(boom(col("x")).as("x"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[Exception] { Drift.ks(bad, vals(1, 2), "x") }
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, s"leak on failure: ${after -- before}")
  }

  test("psi plan carries no Window nodes (total = agg + broadcast join)") {
    // r13 verdict item 3: the corpus-wide total is re-attached by a
    // 1-row broadcast cross-join, so the `WindowExec: No Partition
    // Defined` class stays extinct repo-wide
    val ref = vals(5, 15, 25, 35)
    for (df <- Seq(Drift.psi(ref, ref, "x", lo = 0, hi = 100, bins = 10),
        Drift.psiLogHist(ref, ref, "x"))) {
      val plan = df.queryExecution.analyzed
      assert(plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.isEmpty)
    }
  }

  test("empty current side reports quiet (psi 0, never NaN)") {
    // the streaming monitor's empty-micro-batch case: without the
    // zero-total guard, 0/0 = NaN propagates and NaN > threshold is true
    val ref = vals(5, 15, 25, 35, 45)
    val cur = vals() // empty, same schema
    val out = Drift.psi(ref, cur, "x", lo = 0, hi = 100, bins = 10)
      .orderBy("bin").collect()
    assert(out.length == 10)
    assert(out.forall(r => !r.getAs[Double]("psi").isNaN))
    assert(out.forall(_.getAs[Double]("psi") == 0.0))
    assert(out.forall(_.getAs[Long]("n_cur") == 0L))
    // and the symmetric case: empty reference
    val out2 = Drift.psi(cur, ref, "x", lo = 0, hi = 100, bins = 10).collect()
    assert(out2.forall(r => r.getAs[Double]("psi") == 0.0))
  }

  test("PSI matches the hand formula on a shifted distribution") {
    // ref: 8 low + 2 high; cur: 2 low + 8 high over 2 bins
    val ref = vals(Seq.fill(8)(10.0) ++ Seq.fill(2)(60.0): _*)
    val cur = vals(Seq.fill(2)(10.0) ++ Seq.fill(8)(60.0): _*)
    val out = Drift.psi(ref, cur, "x", lo = 0, hi = 100, bins = 2)
      .orderBy("bin").collect()
    def contrib(pr: Double, pc: Double) =
      BigDecimal((pc - pr) * math.log(pc / pr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = BigDecimal(contrib(0.8, 0.2) + contrib(0.2, 0.8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.head.getAs[Double]("psi") - expected) < 1e-9)
    assert(out.head.getAs[Double]("psi") > 0.25) // "investigate" band
  }

  test("embedding drift: identical sides cos 1 / shift 0; a moved space shows") {
    import org.apache.spark.sql.functions._
    def vecs(shift: Float) = {
      val rnd = new scala.util.Random(3) // fresh stream: same base data
      (0 until 50).map { i =>
        (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f + shift))
      }.toDF("vec_id", "embedding")
    }
    val ref = vecs(0f)
    val same = Drift.embeddingDrift(ref, ref).collect().head
    assert(same.getAs[Double]("cos_means") == 1.0)
    assert(same.getAs[Double]("shift_l2") == 0.0)
    assert(same.getAs[Long]("n_ref") == 50L && same.getAs[Long]("n_cur") == 50L)
    val moved = Drift.embeddingDrift(ref, vecs(0.5f)).collect().head
    assert(moved.getAs[Double]("shift_l2") > 1.0, moved.toString)
    assert(moved.getAs[Double]("max_dim_shift") > 0.3)
    // partition-invariant to the last rounded digit
    val a = Drift.embeddingDrift(ref.repartition(2), vecs(0.5f).repartition(3))
      .collect().head
    assert(a == moved)
  }

  test("loghist PSI: identical ~0, scale shift drifts, empty side quiet") {
    val ref = vals(0.5, 1.0, 2.0, 4.0, 8.0, -3.0, 0.0)
    val same = Drift.psiLogHist(ref, ref, "x").collect()
    assert(same.nonEmpty && same.forall(_.getAs[Double]("psi") == 0.0))
    // 10× scale shift: disjoint buckets, strong drift — and no [lo, hi)
    // declaration needed, which is the point of the log-bucket form
    val cur = vals(5.0, 10.0, 20.0, 40.0, 80.0, -30.0, 0.1)
    val drifted = Drift.psiLogHist(ref, cur, "x").collect()
    assert(drifted.head.getAs[Double]("psi") > 0.25, drifted.head.toString)
    // only observed buckets appear; both sides' counts are present
    assert(drifted.map(_.getAs[Long]("bucket")).distinct.length == drifted.length)
    val quiet = Drift.psiLogHist(ref, vals(), "x").collect()
    assert(quiet.forall(r => !r.getAs[Double]("psi").isNaN &&
      r.getAs[Double]("psi") == 0.0))
  }

  test("corpusDiff classifies added/removed/changed/unchanged by content") {
    import spark.implicits._
    val ref = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("doc_id", "text")
    val cur = Seq((2L, "bb"), (3L, "cc CHANGED"), (4L, "dd"))
      .toDF("doc_id", "text")
    val got = Drift.corpusDiff(ref, cur).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
    val sm = Drift.corpusDiffSummary(Drift.corpusDiff(ref, cur)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sm("added") == ((1L, 2L)) && sm("removed") == ((1L, -2L)))
    assert(sm("changed") == ((1L, 8L)) && sm("unchanged") == ((1L, 0L)))
  }
}
