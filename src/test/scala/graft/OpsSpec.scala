package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** North-star operators: dedup, similarity, text analysis. */
class OpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical text, keeps lowest id") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val got = Dedup.exact(d).orderBy("keep_id").collect()
    assert(got.length == 2)
    assert(got.head.getAs[Long]("keep_id") == 1L)
    assert(got.head.getAs[Long]("copies") == 2L)
  }

  test("minhash LSH finds planted near-duplicates, skips unrelated") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " other words"
    val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val pairs = Dedup.minhashCandidates(d, minEst = 0.3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs at hamming 0, near dups close") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> (base + " extra tail words here"))
    val got = Dedup.simhashCandidates(d, maxHamming = 10).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Int]("hamming")).toMap
    assert(got((1L, 2L)) == 0)
    assert(got.contains((1L, 3L)))
  }

  test("simhash candidates ≡ brute-force hamming join (multi-index recall is exact)") {
    // r15: candidate generation moved from maxHamming+1 single-block keys
    // to C(maxHamming+3, 3) 3-block compound keys (keyspace saturation at
    // sf100 — SCALE.md r15). The output contract is UNCHANGED: exactly
    // the pairs at hamming ≤ maxHamming, with their true distance.
    val d = docs((1 to 30).map { i =>
      i.toLong -> ((1 to 35).map(t => s"w${(t * i) % 47}").mkString(" "))
    }: _*)
    // r16: both key schemes — the small-corpus single-block gate
    // (corpusDocs ≤ simhashCompoundMinDocs) and the scale-safe compound
    // keys (None / large hint) — must emit IDENTICAL pairs.
    for (h <- Seq(0, 3, 10); portable <- Seq(false, true)) {
      val sigs = Dedup.simhashSignatures(d, portable)
      val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa"))
      val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb"))
      val brute = a.join(b, col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
        .filter(col("hamming") <= h)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      for (hint <- Seq(None, Some(30L), Some(10000000L))) {
        val got = Dedup.simhashCandidates(d, maxHamming = h,
            portable = portable, corpusDocs = hint)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
        assert(got == brute, s"maxHamming=$h portable=$portable hint=$hint")
      }
    }
  }

  test("minhash candidates: materialize gate does not change output") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " other words"
    val d = docs(1L -> base, 2L -> nearDup, 3L -> (base + " tail"))
    def pairs(hint: Option[Long]) =
      Dedup.minhashCandidates(d, minEst = 0.1, corpusDocs = hint).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_jaccard"))
        .toMap
    val small = pairs(Some(3L))          // live sigs, no materialize
    val large = pairs(Some(10000000L))   // materialized sig table
    val none = pairs(None)               // unknown count → materialize
    assert(small == large && large == none)
    assert(small.nonEmpty)
  }

  test("containment: explicit-width gate does not change output") {
    // r16: corpora above containmentExplicitWidthMinDocs pin explicit
    // exchange widths (and an extra pair-key repartition) so AQE's
    // byte-target coalescing can't under-partition the pair agg (sf100:
    // 153 GB spill — SCALE.md r16). Plan shape only; the pairs, shared
    // counts, and ratios must be IDENTICAL across both shapes.
    val d = docs((1 to 20).map { i =>
      i.toLong -> ((1 to 12).map(t => s"w${(t + i / 3) % 17}").mkString(" "))
    }: _*)
    def pairs(hint: Option[Long]) =
      Dedup.containmentPairs(d, k = 3, tau = 0.1, maxDf = 100,
          corpusDocs = hint).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getAs[Long]("shared"), r.getAs[Double]("containment"))))
        .toMap
    val aqe = pairs(Some(20L))           // small hint → AQE-managed shape
    val wide = pairs(Some(5000000L))     // large hint → explicit widths
    assert(aqe == wide)
    assert(aqe.nonEmpty)
  }

  test("jaccard pairs computes exact token-set overlap") {
    val d = docs(1L -> "a b c d", 2L -> "a b c e")
    val a = d.select(col("doc_id").as("doc_a"), Dedup.tokenSet(col("text")).as("toks_a"))
    val b = d.select(col("doc_id").as("doc_b"), Dedup.tokenSet(col("text")).as("toks_b"))
    val j = Dedup.jaccardPairs(a.join(b, col("doc_a") < col("doc_b")))
      .collect().head.getAs[Double]("jaccard")
    assert(math.abs(j - 3.0 / 5.0) < 1e-9)
  }

  test("brute-force cosine top-k ranks an identical vector first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to query
      (2L, Array(0.9f, 0.1f, 0.0f)),   // close
      (3L, Array(0.0f, 1.0f, 0.0f)))   // orthogonal
      .toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 2)
      .orderBy("rank").collect()
    assert(got(0).getAs[Long]("c_id") == 1L)
    assert(got(0).getAs[Double]("sim") == 1.0)
    assert(got(1).getAs[Long]("c_id") == 2L)
  }

  test("bucketed ANN agrees with brute force for same-bucket vectors") {
    import spark.implicits._
    val vecs = (0L to 20L).map(i =>
      (i, Array.tabulate(8)(j => (((i * 7 + j * 3) % 11).toFloat + 1f))))
      .toDF("vec_id", "embedding") // all-positive → same sign bucket
    val bf = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 5)
      .select("c_id").collect().map(_.getLong(0)).toSeq
    val bk = Similarity.bucketedTopK(vecs.filter($"vec_id" === 0), vecs, k = 5)
      .select("c_id").collect().map(_.getLong(0)).toSeq
    assert(bf == bk)
  }

  test("text analysis: tokens, stopwords, punctuation, fingerprint") {
    val d = docs(1L -> "The cat and the dog, quickly!")
    val f = TextAnalysis.qualityFeatures(d).collect().head
    assert(f.getAs[Long]("n_tokens") == 6L)
    // "the" (x2, case-insensitive) + "and" = 3 of 6
    assert(math.abs(f.getAs[Double]("stop_ratio") - 0.5) < 1e-9)
    assert(f.getAs[Double]("punct_ratio") > 0)

    val fp = docs(1L -> "a b  c", 2L -> "a b c", 3L -> "a b d")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    assert(fp(0) == fp(1)) // whitespace-insensitive canonicalization
    assert(fp(0) != fp(2))
  }

  test("IVF ANN: perfect recall on clustered data, cells partition corpus") {
    import spark.implicits._
    // 4 tight clusters around orthogonal axes → IVF with enough cells and
    // probes must match brute force exactly
    val vecs = (0L until 40L).map { i =>
      val axis = (i % 4).toInt
      val base = Array.fill(8)(0.01f * ((i % 7).toInt + 1))
      base(axis) = 10f + (i % 5)
      (i, base)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val bf = Similarity.bruteForceTopK(queries, vecs, k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, vecs, k = 5, nCells = 4, nprobe = 4, iters = 2)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == bf, "nprobe=nCells IVF must equal brute force")
    // fewer probes: results are a subset with correct sims
    val ivf1 = Similarity.ivfTopK(queries, vecs, k = 5, nCells = 4, nprobe = 1, iters = 2)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf1.nonEmpty && ivf1.subsetOf(
      Similarity.bruteForceTopK(queries, vecs, k = 40).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet))
  }

  test("PQ/ADC: clustered data recalls its cluster; plan broadcasts the LUT") {
    import spark.implicits._
    // 4 tight clusters on orthogonal axes, 16-d so m=4 → 4-d subspaces;
    // a query's ADC-nearest neighbors must come from its own cluster
    val vecs = (0L until 48L).map { i =>
      val axis = (i % 4).toInt
      val base = Array.fill(16)(0.01f * ((i % 7).toInt + 1))
      base(axis * 4) = 10f + (i % 5)
      (i, base)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val pq = Similarity.pqTopK(queries, vecs, k = 5, m = 4, codes = 8, iters = 1)
    val rows = pq.collect()
    assert(rows.length == 4 * 5)
    rows.foreach { r =>
      val (q, c) = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      assert(q % 4 == c % 4, s"query $q matched cross-cluster neighbor $c")
    }
    // ADC scan never shuffles raw vectors: the LUT side is broadcast
    // (keyless → nested-loop) and top-k runs through GroupedTopK, so no
    // (q,c)-pair aggregation state exists anywhere in the plan
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(plan.contains("PartialTopK"), plan.take(600))
    // ranks are 1..k per query, distances non-decreasing
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val ds = sorted.map(_.getAs[Double]("adc"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("SCD2: runs compact, intervals chain, exactly one current per key") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val changes = Seq(
      (1L, 1L, t(0), "A"), (1L, 2L, t(1), "A"),   // run of A compacts
      (1L, 3L, t(2), "B"), (1L, 4L, t(3), "A"),   // A again = NEW version
      (2L, 5L, t(0), "X"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.ops.Cdc.scd2(changes, Seq("user_id"), "ts", "event_id",
        Seq("event_type"))
      .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
      .sortBy(x => (x._1, x._3.getTime))
    assert(out.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, "A"), (1L, "B"), (1L, "A"), (2L, "X")))
    // intervals chain: each valid_to equals the next valid_from
    val u1 = out.filter(_._1 == 1L)
    assert(u1.init.zip(u1.tail).forall { case (a, b) => a._4.contains(b._3) })
    // exactly one current row per key, and it's the last version
    assert(out.filter(_._5).map(_._1).toSeq == Seq(1L, 2L))
    assert(u1.last._4.isEmpty && u1.last._5)
  }

  test("entity resolution: block-bounded pairs, hot-block cap, no cartesian") {
    import spark.implicits._
    val recs = Seq(
      (1L, "acme corp", "CL"), (2L, "acme corp.", "CL"),  // dist 1, same block
      (3L, "acme corp", "AR"),                            // same name, OTHER block
      (4L, "zenith ltd", "CL"), (5L, "completely other", "CL"))
      .toDF("id", "name", "country")
    val pairs = graft.ops.EntityResolution.blockedPairs(
      recs, "id", "name", Seq("country"), maxDistance = 2)
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cross-block identical names never pair; in-block far names filtered
    assert(got == Set((1L, 2L)), s"got $got")
    assert(!pairs.queryExecution.executedPlan.toString.contains("Cartesian"))
    // hot-block cap drops the whole oversized block
    val hot = (10L until 30L).map(i => (i, s"name $i", "HOT")) :+ (40L, "x", "COLD") :+ (41L, "x", "COLD")
    val capped = graft.ops.EntityResolution.blockedPairs(
      hot.toDF("id", "name", "country"), "id", "name", Seq("country"),
      maxDistance = 99, maxBlock = Some(5))
    val cps = capped.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cps == Set((40L, 41L)), s"hot block not dropped: $cps")
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    import graft.ops.Skew
    // hot key: 90% of facts share key 1
    val facts = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, 1000L + i))).toDF("k", "fact_id")
    val dims = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "label")
    val plain = facts.join(dims, "k").select("fact_id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = Skew.saltedJoin(facts, dims, "k", col("fact_id"), saltBuckets = 8)
      .select("fact_id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(plain.length == salted.length && (plain sameElements salted))
    // profile surfaces the hot key first
    val prof = Skew.keySkewProfile(facts, "k").collect()
    assert(prof.head.getLong(0) == 1L)
    assert(prof.head.getAs[Double]("share") == 0.9)
  }

  test("adaptive salted join salts ONLY when a hot key exists; values " +
      "identical either way") {
    import spark.implicits._
    import graft.ops.Skew
    val skewed = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, 1000L + i))).toDF("k", "fact_id")
    val uniform = (1 to 1000).map(i => (i.toLong % 50, i.toLong))
      .toDF("k", "fact_id")
    val dims = (0L to 59L).map(k => (k, s"d$k")).toDF("k", "label")
    // gate reads the exact share (fraction >= 1 skips sampling)
    assert(Skew.hotKeyShare(skewed, "k", fraction = 1.0) == 0.9)
    assert(Skew.hotKeyShare(uniform, "k", fraction = 1.0) == 0.02)
    // r12 ADVICE: null keys never match an inner join — a null-heavy
    // column must NOT read as skewed (was: nulls counted as the hottest
    // key and tripped the salt for nothing)
    val nullHeavy = ((1 to 900).map(i => (null.asInstanceOf[java.lang.Long],
      i.toLong)) ++ (1 to 100).map(i => (java.lang.Long.valueOf(i.toLong % 50),
      1000L + i))).toDF("k", "fact_id")
    assert(Skew.hotKeyShare(nullHeavy, "k", fraction = 1.0) <= 0.05,
      "null keys must not register as joinable skew")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    val hot = Skew.saltedJoinAdaptive(skewed, dims, "k", col("fact_id"),
      sampleFraction = 1.0)
    assert(planOf(hot).contains("_salt"), "hot key must trigger the salt")
    val cold = Skew.saltedJoinAdaptive(uniform, dims, "k", col("fact_id"),
      sampleFraction = 1.0)
    assert(!planOf(cold).contains("_salt"),
      "uniform keys must NOT pay the salt (r12 A/B: 6-13x anti-opt)")
    val nn = Skew.saltedJoinAdaptive(nullHeavy, dims, "k", col("fact_id"),
      sampleFraction = 1.0)
    assert(!planOf(nn).contains("_salt"),
      "null-heavy column must not pay the salt")
    // caller-supplied profile short-circuits the sample scan
    val hinted = Skew.saltedJoinAdaptive(uniform, dims, "k", col("fact_id"),
      knownHotShare = Some(0.5))
    assert(planOf(hinted).contains("_salt"))
    // both branches produce the plain-join rows
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("fact_id", "label").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows(hot) == rows(skewed.join(dims, "k")))
    assert(rows(cold) == rows(uniform.join(dims, "k")))
  }

  test("approx_count_distinct within documented error of exact") {
    val df = Tables.lineitem(spark, sf("sf0.001"))
    val r = Queries.all.find(_.name == "q33_approx_distinct").get
      .fn(spark, sf("sf0.001")).collect().head
    assert(r.getAs[Long]("exact_distinct") > 0)
    assert(r.getAs[Boolean]("approx_within_15pct"),
      "HLL estimate outside 15% of exact")
  }

  test("lang id prefers the language whose markers dominate") {
    val d = docs(1L -> "the table and the key of the fast scan is slow",
      2L -> "el valor de la tabla y los datos que vienen")
    val got = TextAnalysis.langId(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
  }
}
