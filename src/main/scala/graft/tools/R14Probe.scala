package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 measurement harness (house rule: probe per-stage wall
  * min-of-N interleaved before believing any ratio or shipping a fix).
  *
  * Topics:
  *  - `minhash` — decompose `dedup_minhash_lsh`'s sf10 wall (r13: 11.3 s
  *    in-suite, 10.96 s isolated, biggest absolute cost after pagerank/
  *    containment with no floor disposition). Stages are cumulative
  *    prefixes of the real pipeline, so stage_k − stage_{k−1} is the
  *    incremental cost of step k:
  *      hash   — scan → shingle explode → md5 double-hash (pre-agg)
  *      sig    — + the 64-min signature UDAF (one exchange on doc_id)
  *      band   — + 16 band keys (posexplode + xxhash64 over sig slices)
  *      full   — + bucket self-join + agreement fraction + pair dedup
  *    plus `sig_xx`, the xxhash64 (non-portable) signature variant: the
  *    declared query pays md5 ONLY so DuckDB can replay the exact
  *    signature pipeline — the production path would use xxhash64, and
  *    the delta quantifies how much of the "floor" is that oracle
  *    compromise rather than inherent work.
  *
  * Usage: R14Probe minhash <sfDir> [runs]
  */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val topic = args(0)
    val sfDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    topic match {
      case "minhash" => minhash(spark, sfDir, runs)
      case "minhash2" => minhash2(spark, sfDir, runs)
      case other => sys.error(s"unknown topic $other")
    }
    spark.stop()
  }

  /** Follow-up to `minhash`: the decomposition put ~64% of the query in
    * the candidate stage (band self-join carrying the 64-long sig array
    * on BOTH sides + an interpreted zip_with per COLLISION row before
    * the pair groupBy). A/B the shipped shape against an id-only band
    * join — distinct (doc_a, doc_b) first, then re-attach signatures
    * from a materialized sig table and compute est_jaccard once per
    * PAIR. est_jaccard is a pure function of (sig_a, sig_b), so max
    * over collision duplicates equals the single computation — values
    * identical by construction. Also prints the collision-row count so
    * the zip_with volume difference is on record. */
  private def minhash2(spark: SparkSession, d: String, runs: Int): Unit = {
    import graft.ops.Dedup
    def docs = graft.Tables.documents(spark, d)

    def declared: DataFrame =
      Dedup.minhashCandidates(docs, minEst = 0.25, portable = true)
        .agg(count(lit(1)).as("n"), sum("est_jaccard").as("chk"))

    def idPairs: DataFrame = {
      val sigs = graft.ops.Materialize(
        Dedup.minhashSignatures(docs, portable = true))
      val banded = Dedup.bandHashes(sigs, 64, 16)
        .select(col("band"), col("band_hash"), col("doc_id"))
      val pairs = banded.select(col("band"), col("band_hash"),
          col("doc_id").as("doc_a"))
        .join(banded.select(col("band"), col("band_hash"),
          col("doc_id").as("doc_b")), Seq("band", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      pairs
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
          Seq("doc_a"))
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(size(filter(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => x === y), eq => eq)) / lit(64.0), 4).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.25)
        .agg(count(lit(1)).as("n"), sum("est_jaccard").as("chk"))
    }

    // one-time: collision-row volume vs distinct pairs
    val sigsOnce = graft.ops.Materialize(
      Dedup.minhashSignatures(docs, portable = true))
    val bOnce = Dedup.bandHashes(sigsOnce, 64, 16)
      .select(col("band"), col("band_hash"), col("doc_id"))
    val collisions = bOnce.select(col("band"), col("band_hash"),
        col("doc_id").as("doc_a"))
      .join(bOnce.select(col("band"), col("band_hash"),
        col("doc_id").as("doc_b")), Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
    val nColl = collisions.count()
    val nPairs = collisions.select("doc_a", "doc_b").distinct().count()
    println(s"[info] collision rows=$nColl distinct pairs=$nPairs " +
      f"(zip_with volume ratio ${nColl.toDouble / nPairs}%.2f×)")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "declared" -> (() => declared),
      "idpairs" -> (() => idPairs))
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to runs; (name, mk) <- variants) {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
      val t0 = System.nanoTime()
      val row = mk().collect().head
      val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      println(f"[probe] minhash2/$name%-9s run$r $dt%6.2f s  $row")
    }
    best.toSeq.sortBy(_._2).foreach { case (n, v) =>
      println(f"[best] minhash2/$n%-9s $v%6.2f s")
    }
  }

  private def minhash(spark: SparkSession, d: String, runs: Int): Unit = {
    import graft.ops.Dedup
    def docs = graft.Tables.documents(spark, d)

    // force-evaluate helpers: every stage ends in a tiny aggregate that
    // DEPENDS on the stage's real output column, so Catalyst can't prune
    // the work under a bare count()
    def hashStage(portable: Boolean): DataFrame = {
      val p = lit(2147483647L)
      val sh = graft.functions.ShinglesExpr.of(col("t"), 3,
        distinct = false, shortWhole = true)
      graft.ops.Spread.wide(docs, Some(col("doc_id")))
        .select(col("doc_id"),
          graft.functions.WsSplitExpr.wsSplit(trim(lower(col("text")))).as("t"))
        .select(col("doc_id"), explode(sh).as("s"))
        .filter(col("s").isNotNull)
        .select(col("doc_id"),
          pmod(if (portable) Dedup.md5Long(col("s"), 1)
            else xxhash64(col("s")), p).as("h1"),
          pmod(if (portable) Dedup.md5Long(col("s"), 17)
            else xxhash64(col("s"), lit(1)), p).as("h2"))
        .agg(sum((col("h1") + col("h2")) % 9973).as("chk")) // mod: ANSI sum overflow
    }
    def sigStage(portable: Boolean): DataFrame =
      Dedup.minhashSignatures(docs, portable = portable)
        .agg(sum(element_at(col("sig"), 1)).as("chk"))
    def bandStage: DataFrame =
      Dedup.bandHashes(
        Dedup.minhashSignatures(docs, portable = true), 64, 16)
        .agg(sum(pmod(col("band_hash"), lit(9973L))).as("chk")) // mod: ANSI sum overflow
    def fullStage: DataFrame =
      Dedup.minhashCandidates(docs, minEst = 0.25, portable = true)
        .agg(count(lit(1)).as("n"), sum("est_jaccard").as("chk"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "hash" -> (() => hashStage(portable = true)),
      "sig" -> (() => sigStage(portable = true)),
      "band" -> (() => bandStage),
      "full" -> (() => fullStage),
      "hash_xx" -> (() => hashStage(portable = false)),
      "sig_xx" -> (() => sigStage(portable = false)))

    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to runs; (name, mk) <- variants) {
      // bench-grade hygiene between measurements (gc → drain → gc)
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
      val t0 = System.nanoTime()
      val row = mk().collect().head
      val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      println(f"[probe] minhash/$name%-8s run$r $dt%6.2f s  $row")
    }
    best.toSeq.sortBy(_._2).foreach { case (n, v) =>
      println(f"[best] minhash/$n%-8s $v%6.2f s")
    }
  }
}
