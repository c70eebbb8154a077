package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is for
  * the pathological ones (a handful of keys holding >10% of a 100 TB
  * fact). The fact side gets a deterministic salt derived from a row
  * identity column (NOT `rand()` — retries/speculative tasks must agree),
  * the dim side is exploded `saltBuckets`×, and the join key becomes
  * (key, salt): one hot partition becomes `saltBuckets` even ones at the
  * cost of a `saltBuckets`× dim replication — cheap when the dim is small,
  * which is exactly the skewed-join case.
  */
object Skew {

  /** Equi-join `facts ⋈ dims` on `key`, salted `saltBuckets` ways.
    * `factId` must be any column making fact rows distinct-ish (salt
    * uniformity, not correctness, depends on it). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
      factId: Column, saltBuckets: Int = 8,
      joinType: String = "inner"): DataFrame = {
    val salted = facts.withColumn("_salt", pmod(xxhash64(factId), lit(saltBuckets)))
    val exploded = dims
      .withColumn("_salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top skewed keys with their share of rows — the diagnostic that
    * decides whether salting is warranted. */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 4))
      .orderBy(col("n").desc)
      .limit(topK)
  }

  /** Estimated share of the hottest key, from a seeded sample (one
    * skinny column scan; `fraction >= 1` reads exactly). The gate input
    * for [[saltedJoinAdaptive]]: 0.0 on an empty frame/sample. */
  def hotKeyShare(facts: DataFrame, key: String,
      fraction: Double = 0.01, seed: Long = 42L): Double = {
    // Null keys never match in an inner join, so a null-heavy column must
    // not read as "skewed": salting an unmatchable key pays the dim
    // explosion for nothing — the exact anti-optimization the gate
    // exists to avoid. Share is hottest NON-NULL key over non-null rows.
    val keyed = facts.select(col(key)).filter(col(key).isNotNull)
    val s = (if (fraction >= 1.0) keyed else keyed.sample(fraction, seed))
      .groupBy(key).agg(count(lit(1)).as("n"))
      .agg(max("n").as("mx"), sum("n").as("tot")).head()
    if (s.isNullAt(1) || s.getLong(1) == 0L) 0.0
    else s.getLong(0).toDouble / s.getLong(1)
  }

  /** [[saltedJoin]] with the decision the operator should have made all
    * along: salt ONLY when a hot key actually exists. Measured (r12,
    * sf10, min-of-3 interleaved, tmp/skewprobe_sf10.log): on UNIFORM
    * keys (lineitem ⋈ supplier) unconditional salting is a 6–13×
    * anti-optimization — salted 6.3–7.6 s vs the planner's broadcast
    * join 0.5–1.1 s, and still 3× vs a forced sort-merge — because the
    * salt forces a shuffled join on an 8×-replicated dim and widens the
    * fact exchange, while buying nothing: there is no straggler task to
    * split. Salting pays only when one key's share makes a single
    * shuffle partition a straggler: with P shuffle partitions a key at
    * share s costs ~max(s, 1/P) of the join wall, so the default gate
    * (10%) triggers roughly when the hot task would run ≥3× the average
    * at P = 32. Below the gate the plain join is returned and the
    * planner keeps ALL its options (broadcast, AQE skew split, SMJ).
    *
    * The gate reads `knownHotShare` when the caller has profiled
    * (zero extra work — [[keySkewProfile]] or catalog stats), else one
    * seeded-sample scan of the key column ([[hotKeyShare]]) at
    * plan-construction time. Either branch returns identical VALUES —
    * the gate chooses a plan, never a result. */
  def saltedJoinAdaptive(facts: DataFrame, dims: DataFrame, key: String,
      factId: Column, saltBuckets: Int = 8, joinType: String = "inner",
      hotShareThreshold: Double = 0.1,
      knownHotShare: Option[Double] = None,
      sampleFraction: Double = 0.01, seed: Long = 42L,
      factCountHint: Long = Long.MaxValue): DataFrame = {
    // r18: below SmallFactGate rows (a parquet-footer count — no job)
    // the detection scan is skipped outright: salting exists to split a
    // straggler PARTITION, and a fact side this small cannot produce one
    // (even a 100%-hot key is a sub-second task), so the plain join is
    // the right plan regardless of the share. The gate saved a full
    // extra pass over the facts per query at sf0.1 (StageLog: the
    // hotKeyShare sample stage re-read all 600 k rows, ~0.5 s of
    // q54's 1.17 s); at scale the hint exceeds the gate and the
    // detection runs exactly as before. Either branch returns identical
    // VALUES — the gate chooses a plan, never a result.
    if (factCountHint <= SmallFactGate)
      return facts.join(dims, Seq(key), joinType)
    val share = knownHotShare.getOrElse(
      hotKeyShare(facts, key, sampleFraction, seed))
    if (share >= hotShareThreshold)
      saltedJoin(facts, dims, key, factId, saltBuckets, joinType)
    else facts.join(dims, Seq(key), joinType)
  }

  /** A hot key only matters once a single shuffle partition would
    * straggle: at ≤ 8M fact rows even one partition holding EVERY row is
    * a small task, so skew detection below this is pure overhead. */
  val SmallFactGate: Long = 8000000L
}
