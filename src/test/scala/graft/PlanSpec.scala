package graft

/** Physical-plan quality assertions — the scale contract, pinned.
  *
  * These tests fail if a change silently degrades the plan shape that
  * makes the engine viable at 100 TB: filters must reach the parquet
  * scan, dims must broadcast, global top-k must not global-sort,
  * aggregations must partial-aggregate map-side.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = Queries.all.find(_.name == name).get.fn(spark, sf("sf0.001"))
    df.queryExecution.executedPlan.toString
  }

  test("q01: filter + projection push into the parquet scan") {
    val p = planOf("q01_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "no pushed filters")
    assert(p.contains("LessThan(l_shipdate"), "shipdate predicate not pushed")
    // column pruning: untouched wide columns never leave the scan
    assert(!p.contains("l_extendedprice"), "scan reads unneeded columns")
    assert(!p.contains("l_returnflag"), "scan reads unneeded columns")
  }

  test("q19 snowflake: dims broadcast, fact-fact join hashes (never sorts)") {
    val p = planOf("q19_snowflake_revenue")
    assert(p.contains("BroadcastHashJoin"), "dim joins must be broadcast")
    // r18: below the footer-count gate the SKINNY orders side
    // (o_orderkey, year) broadcasts too — the fact table then never
    // shuffles at all; above the gate it is hinted SHUFFLE_HASH (r12:
    // at sf10 the SMJ's two fact-side sorts were 25% of the query).
    // Either way: no sort of the big side, ever.
    assert(!p.contains("SortMergeJoin"), "nothing in q19 should sort-merge")
    // and NO pre-aggregate below the orders join: the r10 sf1 sweep
    // measured every pre-agg variant SLOWER than the direct shape, and
    // the r12 sf10 re-measurement confirmed it at scale (9.5 s vs
    // 4.3 s — see the q19 QDef comment) — this pin keeps the negative
    // result from being silently re-introduced
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = Queries.all.find(_.name == "q19_snowflake_revenue").get
      .fn(spark, sf("sf0.001")).queryExecution.optimizedPlan
    val ordersJoins = plan.collect {
      case j: Join if j.condition.exists(_.references.exists(
        _.name == "o_orderkey")) => j
    }
    assert(ordersJoins.nonEmpty, s"orders join missing:\n$plan")
    assert(!ordersJoins.exists(_.collect {
      case a: Aggregate => a
    }.nonEmpty), s"unexpected aggregate below the orders join:\n$plan")
  }

  test("q06 theta join: skinny dim broadcasts, fact never shuffles or sorts") {
    // r17 (VERDICT r16 item 4): below the 50 M-row part gate the skinny
    // (p_partkey, p_size) projection is an explicit broadcast — the
    // lineitem side must reach the probe without an exchange and nothing
    // may sort-merge; the pre-agg exchange after the join is the only
    // shuffle. Above the gate the same query hints SHUFFLE_HASH (plan
    // mechanism pinned by q19's test; the gate arithmetic is plain
    // integer compare on the footer count).
    val p = planOf("q06_theta_join")
    assert(p.contains("BroadcastHashJoin"), s"skinny dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q06 must never sort-merge:\n$p")
    // column pruning: only the two join columns leave the part scan
    assert(!p.contains("p_name"), "part scan reads unneeded columns")
    assert(!p.contains("l_extendedprice"), "lineitem scan reads unneeded columns")
  }

  test("q13 top-k: TakeOrderedAndProject, no global sort") {
    val p = planOf("q13_topk")
    assert(p.contains("TakeOrderedAndProject"), "limit+order should be top-k")
  }

  test("q08 vote groups: map-side partial aggregation") {
    val p = planOf("q08_vote_groups")
    assert(p.contains("partial_count") || p.contains("Partial"),
      "aggregation lacks a partial (map-side) phase")
  }

  test("q07 semi join: broadcast, not shuffle") {
    val p = planOf("q07_semi_broadcast")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "semi join over tiny dim should broadcast")
  }

  test("similarity: query side broadcasts; corpus scanned once") {
    val p = planOf("sim_cosine_topk")
    assert(p.contains("Broadcast"), "query vectors must broadcast")
  }

  test("q17 tumbling agg: partial aggregation before the shuffle") {
    val p = planOf("q17_tumbling_window")
    assert(p.contains("partial_count") || p.contains("Partial"),
      "windowed agg lacks map-side combine")
  }

  test("q35 range join: band table broadcasts (no shuffled NL join)") {
    val p = planOf("q35_range_join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "non-equi join against tiny band table must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q25 sessionize: single window sort feeds both lag and running sum") {
    val p = planOf("q25_sessionize")
    // both window functions share one partitionBy/orderBy → exactly one
    // shuffle for the window (plus the final agg/sort)
    assert(p.split("Window").length - 1 <= 2, "window ops not coalesced")
  }

  test("q44 window values: no Window over the 3-value partition key") {
    val p = planOf("q44_window_values")
    // a Window partitioned by l_returnflag (cardinality 3) would funnel
    // the whole table through <= 3 reducers at any cluster size; the
    // rewrite must be agg + GroupedTopK + broadcast join instead
    assert(!p.contains("Window"), "q44 must not use a window operator")
    assert(p.contains("ExactTopK") && p.contains("PartialTopK"),
      "third_ok must come from the GroupedTopK operator")
    assert(p.contains("BroadcastHashJoin"), "3-row agg join must broadcast")
  }

  test("q41/q09: one hash exchange serves both the agg and the top-k/window") {
    // r9: repartition(l_partkey) pre-satisfies the (pk, sk) aggregation
    // AND the downstream ClusteredDistribution(pk) — a second full
    // group-set shuffle would double the exchange count
    for (name <- Seq("q41_topk_perkey", "q09_window_top1")) {
      val p = planOf(name)
      val hashEx = p.split("Exchange hashpartitioning").length - 1
      assert(hashEx == 1, s"$name: expected exactly 1 hash exchange, got $hashEx")
    }
  }

  test("bm25: corpus tokenized once per pass, no shuffle joins") {
    val p = planOf("retrieval_bm25")
    // two scans total: the postings pass and the 1-row corpus-stats agg;
    // the r8 shape had a third (doc-length join) plus an SMJ on doc_id
    val scans = p.split("Scan parquet").length - 1
    assert(scans <= 2, s"bm25 reads the corpus $scans times")
    assert(!p.contains("SortMergeJoin"), "bm25 must not shuffle-join")
    val tokenizes = p.split("ws_split").length - 1
    assert(tokenizes <= 2, s"bm25 tokenizes $tokenizes times")
  }

  test("sim_ivf_ann: probe side is a LocalRelation, corpus scanned once") {
    val p = planOf("sim_ivf_ann")
    val scans = p.split("Scan parquet").length - 1
    assert(scans == 1, s"final IVF frame should scan the corpus once, got $scans")
    assert(p.contains("LocalTableScan"), "query probes must be driver-built")
  }

  test("er fuzzy pairs: banded levenshtein inside a broadcast block join") {
    val p = planOf("er_fuzzy_pairs")
    assert(p.contains("levenshtein_banded"), "must use the native banded DP")
    assert(p.contains("BroadcastHashJoin"), "block join should broadcast at this SF")
  }

  test("dedup minhash: no cartesian product anywhere") {
    val p = planOf("dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), "LSH must join on band hash, not cross")
  }

  test("q39 resample: 1-row range and type set broadcast into the grid") {
    val p = planOf("q39_resample_gapfill")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "grid construction must broadcast the tiny sides")
    assert(!p.contains("CartesianProduct"), "grid cross join must not be a shuffled cartesian")
  }

  test("curation: quality+language stay in one map stage (no extra shuffle)") {
    val p = planOf("text_curation")
    // one shuffle for the survivor window, one for the left join back —
    // the per-row feature/lang expressions must NOT introduce exchanges
    val exchanges = p.split("Exchange hashpartitioning").length - 1
    assert(exchanges <= 3, s"curation shuffles too much ($exchanges):\n${p.take(1200)}")
  }

  test("sample queries: hash split is map-only before its aggregate") {
    val p = planOf("sample_hash_split")
    // exactly one exchange — the groupBy(split); the split assignment
    // itself is a pure projection
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2, s"hash split must not shuffle to assign buckets:\n${p.take(1200)}")
  }

  test("minhash signatures: one aggregate, no per-permutation explode") {
    val df = graft.ops.Dedup.minhashSignatures(
      Tables.documents(spark, sf("sf0.001")), perms = 64)
    val p = df.queryExecution.executedPlan.toString
    // single ObjectHashAggregate pair (partial+final), one exchange —
    // Spread.wide hash-partitions the narrow local scan ON doc_id, which
    // pre-satisfies the aggregation's clustering, so the spread REPLACES
    // the agg exchange instead of adding one (at scale neither fires
    // twice: wide input → no spread, agg plants its own exchange)
    assert(p.contains("ObjectHashAggregate"), "sketch agg should be object hash aggregate")
    assert(p.split("Exchange").length - 1 == 1,
      "exactly one shuffle for signatures")
    // the shingle build must be the native expression, not the HOF lambda
    assert(p.contains("shingles("), "minhash must shingle via ShinglesExpr")
  }

  test("q45 funnel: stacked stage windows reuse ONE user_id exchange") {
    // three window passes + the per-user rollup all cluster on user_id;
    // a per-stage self-join plan would shuffle the events table once per
    // funnel stage instead
    val df = Queries.all.find(_.name == "q45_funnel").get.fn(spark, sf("sf0.001"))
    df.collect()
    // AQE's toString prints Final + Initial plans — assert on the final only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, got $exchanges:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "funnel must not be join-shaped")
  }

  test("q46 scd2: compaction and interval windows share one key exchange") {
    val df = Queries.all.find(_.name == "q46_scd2").get.fn(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, got $exchanges")
  }

  test("chunk overlap: fingerprint equi-join, never a cartesian") {
    val df = Queries.all.find(_.name == "text_chunk_overlap").get
      .fn(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoopJoin"),
      s"chunk overlap must join on the chunk hash:\n${p.take(800)}")
  }

  test("normalize + boilerplate: pure map stages, zero exchanges") {
    for (q <- Seq("text_normalize", "text_boilerplate")) {
      val p = planOf(q)
      val body = p.substring(p.indexOf("Sort")) // final ORDER BY's exchange is presentation
      assert(!body.replaceFirst("Exchange rangepartitioning[^\n]*", "")
        .contains("Exchange"), s"$q shuffles:\n$p")
    }
  }

  test("shard manifest: map-side hash, ONE partial-aggregated exchange") {
    val p = planOf("export_shards")
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, p)
    assert(p.contains("partial_count") || p.contains("Partial"), p)
  }

  test("semantic dedup: cell equi-join, never a cartesian or NL join") {
    val p = planOf("semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("curation funnel: the whole chain rides ONE corpus scan") {
    val p = planOf("curation_funnel")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 documents scan, got $scans:\n$p")
  }

  test("quantile profile: two-phase result is driver-local order statistics") {
    // r18: quantileProfile runs its two-phase CDF eagerly (range
    // exchange + offsets + targeted-rank extraction — see
    // Profiler.quantilesByKey); the returned frame is the handful of
    // interpolated order statistics, never a lazy plan over the corpus.
    // The distributed machinery itself is pinned by ScaleOpsSpec
    // (values, one-aggregate shape) and the q27 oracle.
    val p = planOf("q52_quantile_profile")
    assert(p.contains("LocalTableScan"),
      "two-phase quantiles must return driver-assembled statistics")
    assert(!p.contains("ObjectHashAggregate"),
      "CDF quantiles must not fall back to the percentile buffer path")
  }

  test("q52b approx profile: one scan, GK sample cut in a codegen projection") {
    val p = planOf("q52b_quantile_profile_approx")
    // exactly one lineitem scan feeds min/max AND the sampled GK columns
    assert(p.split("FileScan parquet").length - 1 == 1,
      "q52b must profile all columns in one pass")
    // the keep-hash is computed once per row in the projection, never
    // re-evaluated per aggregate inside the interpreted GK update
    assert(p.contains("Project") && p.contains("pmod(hash"),
      "sample predicate must be a projection-level expression")
  }

  test("column profile: no Expand multiplying rows before the partial agg") {
    val p = planOf("q38_column_profile")
    assert(!p.contains("Expand"), s"profile re-grew an Expand:\n${p.take(800)}")
  }

  test("pagerank: small-graph iterations broadcast; contribution agg is partial") {
    val p = planOf("graph_pagerank")
    assert(p.contains("BroadcastHashJoin"),
      "rank frames under the threshold must broadcast")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "contribution sums must partial-aggregate")
  }

  test("vocab encode: vocab cut is top-k, encode join is broadcast") {
    val p = planOf("text_vocab_encode")
    assert(p.contains("BroadcastHashJoin"), "encode join must broadcast the vocab")
    assert(!p.contains("Window"), "vocab id rank must not use a window")
    // the corpus-side cut executes at construction since r14 (the id
    // window became a driver-side rank of the collected ≤v-row cut —
    // the join broadcasts the vocab anyway, so O(v) everywhere was
    // already the contract), so its shape is pinned on the exposed
    // stage, not the final executedPlan
    val cut = graft.ops.TextAnalysis.vocabCut(
      Tables.documents(spark, sf("sf0.001")), v = 500)
    assert(cut.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "vocab cut must be per-partition top-k, not a global sort")
  }

  test("semantic decon: eval side broadcast, per-train top-1 pruned pre-shuffle") {
    val p = planOf("decon_semantic")
    assert(p.contains("BroadcastNestedLoopJoin"), "eval set must broadcast")
    assert(p.contains("PartialTopK"), "top-1 must prune per partition")
  }

  test("minhash portable mode (the declared-query path) keeps ObjectHashAggregate") {
    // the declared dedup_minhash_lsh query runs portable=true; a silent
    // fall back to SortAggregate (e.g. a non-ObjectHash-capable buffer
    // type) would double its shuffle cost at scale
    val df = graft.ops.Dedup.minhashSignatures(
      Tables.documents(spark, sf("sf0.001")), perms = 64, portable = true)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), "portable sketch agg must stay object-hash")
    assert(!p.contains("SortAggregate"), "portable sketch agg fell back to sort-based")
  }

  test("loghist quantiles: codegen hash agg, never ObjectHash GK buffers") {
    val p = planOf("q52c_quantile_profile_loghist")
    assert(p.contains("HashAggregate"), "bucket agg must be hash-based")
    assert(!p.contains("ObjectHashAggregate"),
      "loghist exists to avoid the interpreted GK path")
  }

  test("substring spans: one shingle pass, window-marked dups, no join-back") {
    val p = planOf("dedup_substring_spans")
    assert(!p.contains("Join"), "dup mark must be the min≠max window, not a join-back")
    // the shingling chain (split→slice→md5) must be evaluated ONCE — the
    // join-back shape re-ran it per branch and doubled the query
    assert(p.sliding(3).count(_ == "md5") == 1, "shingle chain evaluated more than once")
  }

  test("url canonicalize: map-only rules, ONE partial-aggregated exchange") {
    val p = planOf("url_canonicalize")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      "canonicalization must not join")
    // countDistinct(raw) adds its Expand pass but both aggs stay partial
    assert(p.contains("partial_"), "dedup agg must partial-aggregate")
  }

  test("temperature mix: totals broadcast, corpus never re-shuffled for them") {
    val p = planOf("mix_temperature")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row totals must broadcast")
    assert(!p.contains("CartesianProduct"), "totals join fell off broadcast")
  }

  test("weighted sample: per-partition heaps, no global sort") {
    val p = planOf("sample_weighted")
    assert(p.contains("TakeOrderedAndProject"), "top-k must be heap-based")
  }

  test("containment: posting joins stay equi-keyed, no all-pairs product") {
    val p = planOf("dedup_containment")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "containment must never degrade to an all-pairs product")
    assert(p.contains("partial_"), "pair counts must partial-aggregate")
  }

  test("containment: df prune is a window on the sh exchange, not an agg+join") {
    val p = planOf("dedup_containment")
    // the r8 shape: ONE canonical repartition-by-sh exchange that the df
    // window, the pair self-join, and the sizes agg all hang off — an
    // agg+self-join df prune would add an aggregate pass and a join
    assert(p.contains("windowspecdefinition(sh"),
      "df prune must be a window count over the sh partitioning")
    val reparts = p.split("REPARTITION_BY_COL").length - 1
    assert(reparts >= 1, "postings must be explicitly partitioned by sh")
    // shingle build must be the native expression (codegen), never the
    // interpreted transform+array_distinct lambda
    assert(p.contains("shingles("), "posting build must use ShinglesExpr")
    assert(!p.contains("array_distinct(transform"),
      "interpreted HOF shingle build crept back in")
  }

  test("phash dedup: pigeonhole buckets equi-join, never cross-join") {
    val p = planOf("mm_phash_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "hamming search must go through bucket equi-joins")
  }

  test("bm25: eval-side query frame broadcasts into the posting prune") {
    val p = planOf("retrieval_bm25")
    assert(p.contains("BroadcastExchange"), "query terms must broadcast")
    assert(p.contains("ExactTopK") || p.contains("PartialTopK"),
      "per-query top-k must use the bounded-heap operator")
  }

  test("split decon: split predicate is map-side, eval grams broadcast") {
    val p = planOf("split_decontaminated")
    assert(p.contains("BroadcastExchange"), "eval grams must broadcast")
    assert(!p.contains("CartesianProduct"))
  }
}
