package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting/packing for training-data pipelines.
  *
  * Everything here is HASH-driven, never RNG-driven: `sample()` and
  * `sampleBy()` draw from per-partition RNG streams, so their output
  * depends on partitioning and run order — unacceptable for a split that
  * must be reproducible across reruns, cluster sizes, and engines. A
  * content/key hash gives every row a stable fate, makes splits exactly
  * disjoint, and lets any other engine reproduce the assignment.
  */
object Sampling {

  /** Stable per-row bucket in [0, 100) from the key column (md5-derived,
    * engine-portable — DuckDB: `CAST('0x'||substr(md5(..),1,15) AS
    * BIGINT) % 100`). A salt keeps independent splits independent. */
  def hashBucket(key: Column, salt: String): Column =
    pmod(Dedup.md5Long(concat(lit(salt + ":"), key.cast("string"))), lit(100L))

  /** Deterministic train/val split: rows with bucket < trainPct train,
    * the rest val. Disjoint, exhaustive, stable under any partitioning. */
  def hashSplit(df: DataFrame, key: String, trainPct: Int = 80,
      salt: String = "split"): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(key), salt) < trainPct, lit("train"))
        .otherwise(lit("val")))

  /** Stratified hash-sample: keep `pct`% WITHIN each stratum (language,
    * source, quality band…), not globally. The bucket hash mixes the
    * stratum INTO the key, so each stratum draws from its own
    * independent hash stream — a global hash sample would correlate the
    * picks across strata and (with skewed strata) drift tiny strata's
    * realized rates. Map-only: no shuffle, no per-stratum count pass,
    * deterministic under any partitioning and engine. */
  def stratifiedSample(df: DataFrame, stratumCol: String, key: String,
      pct: Int, salt: String = "strat"): DataFrame =
    df.filter(hashBucket(
      concat_ws("|", col(stratumCol).cast("string"), col(key).cast("string")),
      salt) < pct)

  /** Deterministic k-per-group sample: the reservoir-sample shape with a
    * hash in place of randomness — rows ranked inside each group by the
    * md5 of their key (salted), lowest k win. Same replayable-sampling
    * policy as [[hashSplit]]/[[stratifiedSample]], but with an EXACT
    * per-group count instead of an expected rate. Runs through
    * [[graft.plans.GroupedTopK]]: ≤ k rows per group survive each
    * partition before the one shuffle — never a full sort, never a
    * global window. Output: original columns + `h` (the rank hash, kept
    * so the draw is auditable/reproducible).
    *
    * `key` must uniquely identify rows within a group: the (h, key)
    * tie-break is what makes the draw deterministic, and duplicate keys
    * hash identically, leaving the survivor partition-dependent. The
    * hash rides an internal column while ranking, so a pre-existing `h`
    * input column can't be silently clobbered mid-plan — but the OUTPUT
    * reserves the name, so such input is rejected loudly instead. */
  def perGroupSample(df: DataFrame, groupCol: String, key: String, k: Int,
      salt: String = "pg"): DataFrame = {
    require(!df.columns.contains("h"),
      "perGroupSample reserves output column 'h' for the rank hash; " +
        "rename the input's 'h' column first")
    val hc = "__graft_pg_h"
    val hashed = df.withColumn(hc,
      md5(concat(lit(salt + ":"), col(key).cast("string"))))
    graft.plans.GroupedTopK.perKey(hashed, groupCol,
        Seq(hc -> true, key -> true), k)
      .withColumnRenamed(hc, "h")
  }

  /** Pack documents into training sequences by start offset: a doc joins
    * the sequence its running-sum start position falls in, so every
    * sequence holds < `budgetTokens` tokens of complete docs plus at most
    * one boundary-crossing doc (the streaming-concat approximation — the
    * assembler truncates or pads that last doc; strict ≤budget packing
    * would need a sequential carry that doesn't parallelize).
    *
    * Scale: packing is inherently sequential, so it is done PER SHARD —
    * rows are hash-sharded first, each shard packs independently under a
    * window ordered by doc_id. One shuffle on shard id, bounded state per
    * window; nShards is the parallelism knob. A single global packing
    * order would serialize the whole corpus through one partition.
    * Output: doc_id, shard, n_tokens, seq_id (per-shard sequence index). */
  def packByBudget(documents: DataFrame, budgetTokens: Long,
      nShards: Int = 64, textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    documents
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("shard", pmod(Dedup.md5Long(col("doc_id").cast("string")), lit(nShards.toLong)))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")).cast("double") / budgetTokens)
          .cast("long").as("seq_id"))
  }

  /** Packed training sequences — the trainer's actual input: every
    * [[packByBudget]] bin joined with its documents' dictionary-encoded
    * ids ([[TextAnalysis.vocabEncode]]'s `ids_str`), concatenated in
    * doc_id order. The concat is a collect-sort-join fold (struct sort
    * pins the order; a bare collect_list would be partition-order
    * dependent), bounded per group by the token budget — a sequence
    * never outgrows `budgetTokens` plus one document.
    *
    * One equi-join on doc_id and one partial-agg shuffle on
    * (shard, seq_id); at 100 TB both sides arrive hash-partitioned by
    * doc-derived keys and the output is exactly the shard layout the
    * export sink writes. */
  def exportSequences(packed: DataFrame, encoded: DataFrame): DataFrame =
    packed.join(encoded.select(col("doc_id"), col("ids_str")), "doc_id")
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("ids_str")))),
          s => s.getField("ids_str")), " ").as("ids"))

  /** Data-mixing weights per source/domain for a per-source token budget:
    * the downsampling plan a pre-training mix is built from (cap each
    * domain's contribution; small domains keep weight 1.0).
    *
    * One partial-aggregated scan — token counts reduce map-side, the
    * shuffle carries one row per domain. `weight` is rounded to 4 places
    * FIRST and `sampled_tokens = floor(n_tokens · weight)` is derived
    * from the rounded value, so the plan is reproducible bit-for-bit by
    * any engine from the published weights alone. */
  def domainMixWeights(documents: DataFrame, budgetPerSource: Long,
      sourceCol: String = "source", textCol: String = "text"): DataFrame =
    documents
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .withColumn("weight",
        round(least(lit(1.0), lit(budgetPerSource.toDouble) /
          when(col("n_tokens") > 0, col("n_tokens"))), 4))
      .withColumn("weight", coalesce(col("weight"), lit(1.0)))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        floor(col("n_tokens") * col("weight")).cast("long").as("sampled_tokens"))

  /** Training-export shard manifest: assign every doc a shard by portable
    * key hash and aggregate per-shard stats (docs, tokens, chars, id
    * range). The manifest is what a trainer's data loader consumes — it
    * must be derivable by any engine from the published sharding rule, so
    * the shard id is the same md5 arithmetic as [[hashBucket]], never a
    * partition-dependent function like `spark_partition_id`.
    *
    * Scale: the hash is map-side; one partial-aggregated shuffle carries
    * `nShards` rows. The same `shard` column feeds
    * `df.repartition(nShards, col("shard")).write.partitionBy("shard")`
    * for the actual export, so manifest and data are consistent by
    * construction. */
  def shardManifest(documents: DataFrame, nShards: Int = 16,
      key: String = "doc_id", textCol: String = "text"): DataFrame =
    documents
      .withColumn("shard",
        pmod(Dedup.md5Long(concat(lit("shard:"), col(key).cast("string"))),
          lit(nShards.toLong)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        min(col(key)).as("min_id"), max(col(key)).as("max_id"))

  /** Weighted k-sample without replacement — Efraimidis–Spirakis with the
    * house determinism policy: the uniform draw is a hash, not an RNG.
    * Each row gets `u = (md5(salt:key) mod 1e6 + 0.5) / 1e6` and rank key
    * `w_key = ln(u) / w` (the log of E–S's `u^(1/w)`, same ordering, no
    * cross-engine `pow`); the k LARGEST keys win, so inclusion odds are
    * proportional to weight and the whole draw replays bit-identically on
    * any engine from (salt, key, weight) alone.
    *
    * Scale: the key is map-side arithmetic; top-k is
    * TakeOrderedAndProject — per-partition k-row heaps to the driver,
    * never a global sort. `w_key` is rounded (12 dp) so last-ulp libm
    * `ln` differences can't reorder near-ties, and `key` breaks exact
    * ties. Non-positive weights are excluded (E–S is undefined there). */
  def weightedSample(df: DataFrame, weightCol: String, key: String, k: Int,
      salt: String = "ws"): DataFrame = {
    require(!df.columns.contains("w_key"),
      "weightedSample reserves output column 'w_key'; rename it first")
    val u = (pmod(Dedup.md5Long(
        concat(lit(salt + ":"), col(key).cast("string"))), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    df.filter(col(weightCol) > 0)
      .withColumn("w_key", round(log(u) / col(weightCol), 12))
      .orderBy(col("w_key").desc, col(key))
      .limit(k)
  }

  /** Temperature-scaled domain mixing: the multilingual/multi-source
    * rebalance every large pretraining corpus applies — raw domain shares
    * `p_d` are flattened to `q_d ∝ p_d^α` (α < 1 upsamples the tail,
    * α = 1 keeps proportions), and per-domain sampling rates are whatever
    * hits `targetDocs` at those shares, capped at 1 (a domain can't be
    * sampled above its size without replacement).
    *
    * Complements [[domainMixWeights]] (absolute per-source token budget):
    * this one redistributes RELATIVE mass across domains.
    *
    * Scale: one partial-aggregated count per domain; the two totals ride
    * broadcast 1-row cross-joins, so nothing ever funnels through a
    * single partition. `p^α` is rounded (9 dp) BEFORE the normalizing
    * sum — summing raw `pow` outputs would let last-ulp libm differences
    * and addition order leak into every downstream rate. */
  def temperatureMix(documents: DataFrame, alpha: Double, targetDocs: Long,
      sourceCol: String = "source"): DataFrame = {
    val counts = documents.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val withP = counts
      .crossJoin(broadcast(counts.agg(sum("n_docs").as("__n"))))
      .withColumn("p", col("n_docs").cast("double") / col("__n"))
      .withColumn("pa", round(pow(col("p"), lit(alpha)), 9))
    withP
      .crossJoin(broadcast(withP.agg(sum("pa").as("__z"))))
      .withColumn("q", round(col("pa") / col("__z"), 6))
      .withColumn("rate", round(least(lit(1.0),
        col("q") * lit(targetDocs.toDouble) / col("n_docs")), 6))
      .select(col("source"), col("n_docs"), round(col("p"), 6).as("p"),
        col("q"), col("rate"),
        floor(col("n_docs") * col("rate")).cast("long").as("expected_docs"))
  }
}
