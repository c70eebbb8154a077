package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Hash-driven sampling: stable, disjoint, partition-invariant. */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf("sf0.001"))

  test("hash split is deterministic and partition-invariant") {
    val a = Sampling.hashSplit(docs.repartition(1), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs.repartition(13), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // roughly 80/20 (hash uniformity; generous bounds for 500 docs)
    val train = a.values.count(_ == "train")
    assert(train > 350 && train < 450, train.toString)
  }

  test("independent salts give independent splits") {
    val s1 = Sampling.hashSplit(docs, "doc_id", salt = "a")
      .filter(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSplit(docs, "doc_id", salt = "b")
      .filter(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 != s2) // different salts reshuffle membership
    val overlap = (s1 & s2).size.toDouble / s1.size
    assert(overlap > 0.6 && overlap < 0.95, overlap.toString) // ~0.8 expected
  }

  test("stratified sample: per-stratum rate, determinism, partition invariance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one big stratum, one 100× smaller — each must sample at ~pct
    // independently (a correlated global draw would let the big stratum
    // dominate the small one's realized rate)
    val df = ((0L until 20000L).map(i => (i, "big")) ++
      (20000L until 20200L).map(i => (i, "small"))).toDF("id", "stratum")
    val got = Sampling.stratifiedSample(df, "stratum", "id", pct = 20)
    val rates = got.groupBy("stratum").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("big") > 3500 && rates("big") < 4500, s"big rate off: $rates")
    assert(rates("small") > 20 && rates("small") < 60, s"small rate off: $rates")
    // deterministic + partition-invariant
    val a = got.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratifiedSample(df.repartition(7), "stratum", "id", pct = 20)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("budget packing: sequences respect the budget boundary rule") {
    val packed = Sampling.packByBudget(docs, budgetTokens = 200, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // within each (shard, seq), total tokens of all docs EXCEPT the last
    // stays under budget (the last doc may cross the boundary)
    packed.groupBy(p => (p._2, p._4)).foreach { case ((shard, seq), rows) =>
      val sorted = rows.sortBy(_._1)
      val exceptLast = sorted.dropRight(1).map(_._3).sum
      assert(exceptLast < 200, s"shard $shard seq $seq overfilled: $exceptLast")
    }
    // seq ids are dense from 0 per shard
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val seqs = rows.map(_._4).distinct.sorted.toSeq
      assert(seqs == (0L until seqs.length.toLong).toList)
    }
  }

  test("per-group sample: exact k, deterministic, partition-invariant, pruned plan") {
    import spark.implicits._
    import graft.ops.Sampling
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    def draw(parts: Int) = Sampling.perGroupSample(
        df.repartition(parts), "g", "id", k = 7)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val a = draw(2)
    assert(a == draw(11), "sample must not depend on partitioning")
    assert(a.groupBy(_._1).forall(_._2.size == 7), "exactly k per group")
    // small groups yield the whole group, not an error
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "g")
    assert(Sampling.perGroupSample(tiny, "g", "id", k = 5).count() == 2)
    val plan = Sampling.perGroupSample(df, "g", "id", k = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"), plan.take(400))
  }

  test("weighted sample: weight-biased, exact k, partition-invariant, heap plan") {
    import spark.implicits._
    // 200 light rows (w=1) vs 200 heavy rows (w=50): heavies must dominate
    val df = (0 until 400).map(i =>
      (i.toLong, if (i < 200) 1.0 else 50.0)).toDF("id", "w")
    def draw(parts: Int) = Sampling.weightedSample(
      df.repartition(parts), "w", "id", k = 50).collect()
      .map(_.getLong(0)).toSet
    val a = draw(3)
    assert(a == draw(17), "draw must not depend on partitioning")
    assert(a.size == 50)
    assert(a.count(_ >= 200) > 40, s"heavy rows underrepresented: $a")
    // non-positive weights are never drawn
    val withZero = Seq((1L, 0.0), (2L, -3.0), (3L, 5.0)).toDF("id", "w")
    assert(Sampling.weightedSample(withZero, "w", "id", k = 10)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // reserved output column rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df.withColumnRenamed("w", "w_key"), "w_key", "id", 5)
    }
    // top-k rides per-partition heaps, never a global sort
    val plan = Sampling.weightedSample(df, "w", "id", k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("temperature mix: alpha=1 keeps shares, alpha->0 flattens, rates capped") {
    import spark.implicits._
    val df = (0 until 330).map(i =>
      (i.toLong, if (i < 300) "big" else "small")).toDF("doc_id", "source")
    def mix(alpha: Double) = Sampling.temperatureMix(df, alpha, targetDocs = 200L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    val m1 = mix(1.0)
    assert(math.abs(m1("big")._2 - 300.0 / 330) < 1e-6) // q == p at alpha 1
    val m0 = mix(1e-9) // alpha ~ 0: q -> uniform
    assert(math.abs(m0("big")._2 - 0.5) < 1e-3 &&
      math.abs(m0("small")._2 - 0.5) < 1e-3)
    // small domain upsampled to its cap: rate 1, expected == n_docs
    assert(m0("small")._3 == 1.0 && m0("small")._4 == 30L)
    for (m <- Seq(m1, m0); (_, (n, _, rate, exp)) <- m) {
      assert(rate <= 1.0 && exp <= n)
    }
  }

  test("per-group sample: pre-existing 'h' column is rejected, not clobbered") {
    import spark.implicits._
    import graft.ops.Sampling
    val df = Seq((1L, "x", 9.9)).toDF("id", "g", "h")
    val e = intercept[IllegalArgumentException] {
      Sampling.perGroupSample(df, "g", "id", k = 1)
    }
    assert(e.getMessage.contains("reserves output column 'h'"))
  }

  test("export sequences: ids concatenate in doc order, bounded by budget") {
    import spark.implicits._
    import graft.ops.{Sampling, TextAnalysis}
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val packed = Sampling.packByBudget(docs, budgetTokens = 128, nShards = 4)
    val enc = TextAnalysis.vocabEncode(docs, v = 100)
    val seqs = Sampling.exportSequences(packed, enc)
    val maxDoc = packed.agg(org.apache.spark.sql.functions.max("n_tokens"))
      .collect().head.getLong(0)
    val rows = seqs.collect()
    assert(rows.nonEmpty)
    // budget bound: a bin holds < budget before its last doc is added
    assert(rows.forall(_.getAs[Long]("n_tokens") < 128 + maxDoc))
    // doc order inside a sequence: rebuild one group by hand
    val g = packed.join(enc.select($"doc_id", $"ids_str"), "doc_id")
      .orderBy("doc_id").collect()
      .groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_id")))
    rows.foreach { r =>
      val want = g((r.getLong(0), r.getLong(1)))
        .map(_.getAs[String]("ids_str")).mkString(" ")
      assert(r.getAs[String]("ids") == want)
    }
    // partitioning-invariant
    val again = Sampling.exportSequences(
      Sampling.packByBudget(docs.repartition(7), budgetTokens = 128,
        nShards = 4), enc).orderBy("shard", "seq_id").collect()
    assert(again.toSeq == seqs.orderBy("shard", "seq_id").collect().toSeq)
  }
}
