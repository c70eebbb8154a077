package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a reference dataset and a
  * current batch — the check a production ingest runs before letting a
  * new crawl/snapshot into the training mix (upstream format changes,
  * collapsed fields, and source outages all show up as drift long before
  * they show up as model regressions).
  *
  * PSI (population stability index) over FIXED-WIDTH bins on a declared
  * [lo, hi) range: bin edges are a pure function of the arguments, never
  * of the data (data-dependent quantile edges make the metric
  * incomparable across runs and engines). Conventional reading:
  * < 0.1 stable, 0.1–0.25 moderate drift, > 0.25 investigate.
  *
  * Scale shape: bin assignment is one map-side expression on each scan;
  * each side partial-aggregates to `bins` rows before its shuffle; the
  * spine join and PSI arithmetic touch `bins` rows. Two scans, O(bins)
  * shuffled — nothing about the corpus size reaches the wire.
  */
object Drift {

  /** Clamped fixed-width bin index in [0, bins). */
  def binOf(x: Column, lo: Double, hi: Double, bins: Int): Column =
    least(lit(bins - 1L), greatest(lit(0L),
      floor((x.cast("double") - lo) / (hi - lo) * bins))).cast("long")

  /** Per-bin PSI detail: counts, eps-smoothed proportions, and each
    * bin's contribution, plus the total `psi` replicated on every row
    * (sum of ROUNDED contributions, so the published per-bin report
    * reproduces the headline number exactly). Empty bins are present
    * with zero counts — the report's shape never depends on the data. */
  /** Clamped fixed-bin histogram: (bin, `n`) counts. */
  def hist(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      bins: Int, n: String): DataFrame =
    df.select(binOf(col(valueCol), lo, hi, bins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))

  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int = 10,
      eps: Double = 1e-6): DataFrame =
    psiFromHists(hist(ref, valueCol, lo, hi, bins, "n_ref"),
      hist(cur, valueCol, lo, hi, bins, "n_cur"), bins, eps)

  /** PSI from precomputed (bin, n_ref) / (bin, n_cur) histograms — the
    * form a STREAMING monitor uses: the reference histogram is computed
    * once and frozen, each micro-batch contributes only its own O(bins)
    * counts.
    *
    * An EMPTY side (total 0) is "no evidence", not "infinite drift":
    * without the guard 0/0 is NaN, Spark orders NaN greatest, and the
    * monitor would alarm on every empty micro-batch — which foreachBatch
    * routinely delivers. With it, an empty side yields psi = 0 and all
    * contributions 0, so the streaming report is quiet (alarm = false)
    * and still present, distinguishable from an absent report. */
  def psiFromHists(refHist: DataFrame, curHist: DataFrame, bins: Int,
      eps: Double = 1e-6): DataFrame = {
    val spine = refHist.sparkSession.range(bins).select(col("id").as("bin"))
    val joined = spine
      .join(refHist, Seq("bin"), "left")
      .join(curHist, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    psiFromJoined(joined, "bin", eps)
  }

  /** PSI over LOG-HISTOGRAM buckets ([[Profiler.logBucket]]) — the
    * continuous-data path. Declared fixed-width bins need a declared
    * [lo, hi), which a long-tailed continuous column doesn't have;
    * multiplicative buckets cover the whole double range with bounded
    * relative width, no data-dependent edges, and the same
    * cross-run/cross-engine comparability. The spine is the UNION of
    * observed buckets (the bucket space is unbounded, so absent-on-both
    * buckets don't exist; absent-on-one gets the eps floor exactly like
    * an empty fixed bin). Two scans, O(occupied buckets) shuffled. */
  def psiLogHist(ref: DataFrame, cur: DataFrame, valueCol: String,
      relErr: Double = 0.05, eps: Double = 1e-6): DataFrame = {
    def histOf(df: DataFrame, r: Column, c: Column) = df
      .select(Profiler.logBucket(col(valueCol).cast("double"), relErr).as("bucket"))
      .filter(col("bucket").isNotNull) // null values carry no distribution
      .groupBy("bucket").agg((count(lit(1)) * r).as("r"), (count(lit(1)) * c).as("c"))
    val joined = histOf(ref, lit(1L), lit(0L))
      .unionAll(histOf(cur, lit(0L), lit(1L)))
      .groupBy("bucket").agg(sum("r").as("n_ref"), sum("c").as("n_cur"))
    psiFromJoined(joined, "bucket", eps)
  }

  /** Shared PSI arithmetic over a (key, n_ref, n_cur) frame. An EMPTY
    * side (total 0) reports quiet (psi 0, alarm-safe) rather than NaN —
    * see [[psiFromHists]].
    *
    * Shape: the bucket frame is referenced exactly ONCE — it collapses
    * to a single row (`collect_list` + the two totals), every per-bucket
    * proportion/contribution and the corpus-wide psi are computed as
    * array arithmetic on that row, and the report explodes back out.
    * The alternatives both re-execute the upstream histograms (corpus
    * scans!) per reference unless exchange reuse happens to fire: a
    * broadcast-total cross-join reads the frame 2×, a partition-less
    * window was the r13 warning class. One row holding O(buckets)
    * structs is bounded by construction — fixed `bins` for declared-bin
    * PSI, O(log(range)/relErr) occupied buckets for the log-hist form.
    * Each contrib is pre-rounded 6 dp and the total re-rounds 6 dp, so
    * array-order noise (~1e-16·buckets) dies at the final round. */
  private def psiFromJoined(joined: DataFrame, key: String,
      eps: Double): DataFrame = {
    val packed = joined.agg(
      collect_list(struct(col(key).as("k"),
        col("n_ref"), col("n_cur"))).as("rows"),
      sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    val quiet = coalesce(col("t_ref"), lit(0L)) === 0 ||
      coalesce(col("t_cur"), lit(0L)) === 0
    def prop(n: Column, t: Column): Column =
      when(t === 0, lit(eps))
        .otherwise(greatest(n / t.cast("double"), lit(eps)))
    def contribOf(r: Column): Column = {
      val pr = prop(r.getField("n_ref"), col("t_ref"))
      val pc = prop(r.getField("n_cur"), col("t_cur"))
      when(quiet, lit(0.0)).otherwise(round((pc - pr) * log(pc / pr), 6))
    }
    packed
      .select(col("rows"), col("t_ref"), col("t_cur"), quiet.as("q"),
        round(aggregate(transform(col("rows"), contribOf(_)),
          lit(0.0), _ + _), 6).as("psi"))
      .select(explode(col("rows")).as("r"),
        col("t_ref"), col("t_cur"), col("q"), col("psi"))
      .select(col("r.k").as(key),
        col("r.n_ref").as("n_ref"), col("r.n_cur").as("n_cur"),
        round(prop(col("r.n_ref"), col("t_ref")), 6).as("p_ref"),
        round(prop(col("r.n_cur"), col("t_cur")), 6).as("p_cur"),
        when(col("q"), lit(0.0)).otherwise(
          round((prop(col("r.n_cur"), col("t_cur"))
              - prop(col("r.n_ref"), col("t_ref")))
            * log(prop(col("r.n_cur"), col("t_cur"))
              / prop(col("r.n_ref"), col("t_ref"))), 6)).as("contrib"),
        col("psi"))
  }

  /** Embedding-distribution drift: did the VECTOR SPACE move between the
    * reference corpus and the current batch (new embedding model rev,
    * upstream preprocessing change, topic shift)? Compares per-dimension
    * means: cosine between the two mean vectors (1 = same direction),
    * the L2 length of the mean shift, and the single worst-moving
    * dimension — the triage trio for "re-embed or ingest?".
    *
    * Scale shape: posexplode is map-side, each side partial-aggregates
    * to d rows before its shuffle, and everything after the join touches
    * d rows — corpus size never crosses the wire. Determinism: per-dim
    * means are rounded (6 dp) BEFORE the summary arithmetic, so
    * FP-addition-order noise dies at the dimension level and the
    * summary is a pure function of 2·d rounded numbers.
    *
    * Output: one row (n_ref, n_cur, cos_means, shift_l2, max_dim_shift),
    * all rounded 6. */
  def embeddingDrift(ref: DataFrame, cur: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    def means(df: DataFrame, side: String) = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(round(avg(col("x").cast("double")), 6).as(s"m_$side"),
        count(lit(1)).as(s"n_$side"))
    val joined = means(ref, "ref").join(means(cur, "cur"), "dim")
    joined.agg(
        max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
        sum(col("m_ref") * col("m_cur")).as("__dot"),
        sum(col("m_ref") * col("m_ref")).as("__rr"),
        sum(col("m_cur") * col("m_cur")).as("__cc"),
        sum(pow(col("m_ref") - col("m_cur"), 2)).as("__d2"),
        max(abs(col("m_ref") - col("m_cur"))).as("__md"))
      .select(col("n_ref"), col("n_cur"),
        round(col("__dot") / (sqrt(col("__rr")) * sqrt(col("__cc"))), 6)
          .as("cos_means"),
        round(sqrt(col("__d2")), 6).as("shift_l2"),
        round(col("__md"), 6).as("max_dim_shift"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic:
    * D = max over observed values of |F_ref(x) − F_cur(x)|, with the
    * empirical CDFs evaluated at every distinct value of either side.
    * Output is one row: (d_stat, n_ref, n_cur) — d_stat rounded 6.
    *
    * Scale shape: each side collapses to per-VALUE counts before any
    * wide operation (one shuffle keyed on the value, partial-aggregated
    * map-side), so the cumulative scan sees O(V) rows — V = distinct
    * values, not row count. The running sums are the two-phase
    * distributed form ([[Ids.stableIds]]'s pattern), NOT a global
    * `Window.orderBy` — the window funnels every distinct value through
    * ONE partition, which on a continuous column (V ≈ N) is a
    * driver-class bottleneck at scale: range-repartition by `v`,
    * cumulate WITHIN each sorted partition, and seed each partition
    * with the driver-cumsum of the per-partition count totals (one pair
    * of longs per partition crosses the driver). The cumulative values
    * depend only on the total order of `v`, never on where the range
    * boundaries fall, so the statistic is partitioning-invariant
    * (DriftSpec pins this). For genuinely continuous data the
    * declared-bin [[psi]] remains the cheaper quantized answer; this
    * path just removes KS's scale cliff.
    *
    * Execution contract: EAGER. The two-phase form needs both passes to
    * read one pinned partitioning, so this method runs its Spark jobs at
    * CALL time and returns the single result row as a local DataFrame —
    * every intermediate block is unpersisted before it returns. A
    * monitoring loop may therefore call it per micro-batch without
    * accumulating persisted RDDs or deferred jobs; the price is that the
    * result is not lazily composable into a larger plan (it is one row —
    * nothing is lost). */
  def ks(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val spark = ref.sparkSession
    val v = col(valueCol).cast("double").as("v")
    val counted = ref.select(v).groupBy("v")
      .agg(count(lit(1)).as("r"), lit(0L).as("c"))
      .unionAll(cur.select(v).groupBy("v")
        .agg(lit(0L).as("r"), count(lit(1)).as("c")))
      .groupBy("v").agg(sum("r").as("n_r"), sum("c").as("n_c"))
    // phase 1: range-exchange on v, sort within partitions, pin ONE
    // materialization (the offsets pass and the scoring pass must see
    // the same partitioning), then ship one (sum_r, sum_c) per partition
    // to the driver for the exclusive prefix offsets. The pin is a
    // persist WE hold a handle to — not a checkpoint — so it can be
    // released the moment the statistic is computed (r12 ADVICE: the
    // checkpointed RDD previously lived until the returned frame was
    // GC'd, leaking blocks in per-micro-batch monitoring loops). Both
    // passes read this one RDD object, so they see identical partitions;
    // a lost block recomputes through the same shuffle output.
    val ranged = counted.repartitionByRange(col("v"))
      .sortWithinPartitions("v").rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EVERYTHING after the persist sits in try/finally: either collect()
    // can throw (lost executor, cancelled job), and a monitoring loop
    // that retries on transient failures must not accumulate pinned
    // blocks — the success-path-only unpersist was exactly the leak the
    // eager contract promises to close (r13 ADVICE).
    try {
      val partials = ranged.mapPartitionsWithIndex { (pid, it) =>
        var r = 0L; var c = 0L
        it.foreach { row => r += row.getLong(1); c += row.getLong(2) }
        Iterator.single((pid, r, c))
      }.collect().sortBy(_._1)
      val offR = partials.map(_._2).scanLeft(0L)(_ + _)
      val offC = partials.map(_._3).scanLeft(0L)(_ + _)
      val tR = if (offR.isEmpty) 0L else offR.last
      val tC = if (offC.isEmpty) 0L else offC.last
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("d_stat",
          org.apache.spark.sql.types.DoubleType, nullable = true),
        org.apache.spark.sql.types.StructField("n_ref",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("n_cur",
          org.apache.spark.sql.types.LongType, nullable = true)))
      // empty-side guard: with tR or tC == 0 the CDF ratio is 0/0 and
      // d_stat comes back NaN — poison for an alarm threshold. Mirror the
      // psi path's quiet contract (empty micro-batch ⇒ no drift signal):
      // report d_stat 0 with the true counts. Known driver-side, so the
      // guard costs no job.
      if (tR == 0L || tC == 0L)
        return spark.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(0.0, tR, tC)), outSchema)
      // phase 2: map-only cumulative sums with the partition offsets; only
      // (cum_r, cum_c) survive — the max-|ΔCDF| reduction needs no order.
      val cdfSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cum_r",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cum_c",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val cdfRdd = ranged.mapPartitionsWithIndex { (pid, it) =>
        var r = offR(pid); var c = offC(pid)
        it.map { row =>
          r += row.getLong(1); c += row.getLong(2)
          org.apache.spark.sql.Row(r, c)
        }
      }
      val agg = spark.createDataFrame(cdfRdd, cdfSchema)
        .agg(
          round(max(abs(col("cum_r") / lit(tR.toDouble)
            - col("cum_c") / lit(tC.toDouble))), 6).as("d_stat"),
          max(lit(tR)).as("n_ref"), max(lit(tC)).as("n_cur"))
      // Materialize the one-row result NOW and hand back a local frame —
      // see the eager-execution contract in the Scaladoc above.
      val result = agg.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(result: _*), agg.schema)
    } finally ranged.unpersist(blocking = false)
  }

  /** Corpus snapshot diff — which documents were added, removed, or
    * changed between two snapshots, the audit that precedes any
    * incremental re-process (re-embed, re-dedup, re-train decisions).
    *
    * One co-partitioned full-outer join on doc_id; the shuffle carries
    * only (doc_id, md5, length) — never the document bodies — so the
    * diff of a 100 TB corpus moves ~40 bytes per document. Status is
    * decided by content hash, not timestamps: storage-layer rewrites
    * that didn't change bytes stay `unchanged`. */
  def corpusDiff(ref: DataFrame, cur: DataFrame,
      textCol: String = "text"): DataFrame = {
    val r = ref.select(col("doc_id"), md5(col(textCol)).as("__sig_r"),
      length(col(textCol)).cast("long").as("n_chars_ref"))
    val c = cur.select(col("doc_id"), md5(col(textCol)).as("__sig_c"),
      length(col(textCol)).cast("long").as("n_chars_cur"))
    r.join(c, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("__sig_r").isNull, lit("added"))
          .when(col("__sig_c").isNull, lit("removed"))
          .when(col("__sig_r") === col("__sig_c"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select("doc_id", "status", "n_chars_ref", "n_chars_cur")
  }

  /** Churn rollup of [[corpusDiff]]: doc counts and net character delta
    * per status — the one-screen "how big was this ingest" report. */
  def corpusDiffSummary(diff: DataFrame): DataFrame =
    diff.groupBy("status").agg(count(lit(1)).as("n_docs"),
      sum(coalesce(col("n_chars_cur"), lit(0L)) -
        coalesce(col("n_chars_ref"), lit(0L))).as("chars_delta"))
}
