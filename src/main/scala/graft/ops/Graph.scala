package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph compute over edge DataFrames — the family next to
  * [[Dedup.connectedComponents]] (pointer-doubling): PageRank by power
  * iteration with a FIXED iteration count.
  *
  * Determinism contract: every iteration's ranks are rounded to 6
  * decimals before feeding the next one. The per-node contribution sum
  * is a shuffle aggregation whose float addition order is
  * partition-dependent (~1e-15 relative noise); rounding far above the
  * noise floor resets the drift each iteration, so the fixpoint is
  * bit-identical across partitionings AND engines — the same
  * round-before-compare policy the consensus pipeline uses.
  *
  * Scale shape: the edge list is symmetrized and deduped once (one
  * shuffle); each iteration is one join of edges against the previous
  * O(nodes) rank frame (both sides partitioned by the join key) and one
  * partial-aggregated shuffle of contributions — nothing iterates on the
  * driver except the loop counter, and no action runs until the caller
  * materializes (the q51 lesson: per-iteration driver actions are the
  * scale-killer, lazy chaining is fine at fixed depth).
  */
object Graph {

  /** PageRank over the UNDIRECTED graph induced by `edges` (symmetrized,
    * self-loops dropped, duplicate edges collapsed). Every node in the
    * edge list has degree ≥ 1, so there are no dangling nodes and the
    * simple update rank = (1−d)/n + d·Σ rank(nb)/deg(nb) conserves mass.
    * Output: (node, deg, rank) with rank rounded 6.
    *
    * `broadcastNodes`: when the node count (a driver scalar this op
    * already paid for) is at or below this, the per-iteration rank and
    * contribution frames are broadcast instead of shuffle-joined — the
    * iteration collapses from three exchanges to the one unavoidable
    * contribution aggregation. The optimizer can't make this call itself
    * (post-join frames carry no stats), but it is the same size-based
    * decision AQE applies, made with exact knowledge. Above the
    * threshold every join shuffles — the 100 TB path.
    *
    * `checkpointEvery`: lazy chaining doubles the logical plan per
    * iteration — fine at the default depth 5, but analysis/codegen time
    * and stack depth blow up past ~20 — so ranks are MATERIALIZED every
    * k iterations, truncating lineage exactly as
    * [[Dedup.connectedComponents]] does per round. `checkpointDir`
    * selects reliable `checkpoint()` over executor-local blocks
    * (`localCheckpoint`): local blocks die with an executor, and on a
    * 1000-executor run losing one mid-power-iteration kills the job. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, damping: Double = 0.85,
      broadcastNodes: Long = 1000000L, checkpointEvery: Int = 8,
      checkpointDir: Option[String] = None): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val materialize = Materialize.fn(edges.sparkSession, checkpointDir)
    // materialized once: every iteration joins against these, and the
    // lazy lineage would re-derive the upstream edge join per iteration
    // (the op is already eager — n below is an action — so this adds no
    // extra job, it just pins the frame the loop reuses)
    val und = materialize(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct())
    val degs = materialize(und.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")))
    val n = degs.count() // driver scalar
    // an empty graph (a pushed-down filter or pruned partition can
    // legitimately leave zero edges) has no 1/n to take — return the
    // (node, deg, rank) schema with zero rows instead of dividing
    if (n == 0) return degs.withColumn("rank", lit(0.0))
    val small = n <= broadcastNodes
    def maybeBc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val base = (lit(1.0) - lit(damping)) / lit(n.toDouble)
    var ranks = degs.withColumn("rank", round(lit(1.0) / lit(n.toDouble), 6))
    for (i <- 1 to iters) {
      val sums = und
        .join(maybeBc(ranks), und("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = degs
        .join(maybeBc(sums), degs("node") === sums("dst"), "left")
        .select(col("node"), col("deg"),
          round(base + lit(damping) * coalesce(col("s"), lit(0.0)), 6)
            .as("rank"))
      // lineage truncation: without it the plan doubles per iteration
      // (rounding makes the materialized values bit-stable, so this
      // cannot change the result — only the plan)
      if (i % checkpointEvery == 0 && i < iters) ranks = materialize(ranks)
    }
    ranks
  }
}
