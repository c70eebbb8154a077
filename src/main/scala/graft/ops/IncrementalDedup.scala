package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous-ingest exact dedup: each batch is checked against the
  * corpus-so-far and the survivor hashes are committed back — the
  * operational loop a training-data pipeline runs every ingest cycle.
  *
  *   1. [[Dedup.bloomPrefilter]] against the current hash state: rows the
  *      bloom rejects skip the verification join entirely (at a steady
  *      state most of every batch is novel, so most rows never shuffle).
  *   2. Exact split: known rows are dropped, in-batch duplicates collapse
  *      to their lowest doc_id.
  *   3. New hashes are [[StateTable.upsert]]ed — versioned, atomic,
  *      crash-safe; a failed run leaves the previous corpus state intact
  *      and the batch simply reruns.
  *
  * State grows by one row per unique document ever seen (hash + keeper
  * id), partitioned by the state table's key shuffle — the corpus text
  * itself is never re-read.
  *
  * Every pinned frame in this file goes through [[Materialize]]: set
  * `graft.checkpoint.dir` to make the pins RELIABLE on a cluster —
  * the commit-then-return contract (caller sees exactly the rows whose
  * hashes were committed) otherwise rests on executor-local blocks
  * that die with their executor.
  */
object IncrementalDedup {

  /** Process one batch. Returns (accepted rows, committed version).
    * Accepted = first-seen content, lowest doc_id wins within the batch. */
  def ingest(spark: SparkSession, stateRoot: String, batch: DataFrame,
      expectedCorpus: Long = 1000000L): (DataFrame, Long) =
    ingestKeyed(spark, stateRoot, batch,
      md5(trim(lower(col("text")))), expectedCorpus)

  /** Continuous-ingest URL dedup: [[ingest]] keyed on the CANONICAL URL
    * ([[Urls.canonicalize]]) instead of the content hash — the cheap
    * first gate of a crawl pipeline, applied before a byte of body is
    * fetched or hashed. Same state/commit/replay contract; the state
    * table stores md5(canonical_url) → keeper. */
  def ingestByUrl(spark: SparkSession, stateRoot: String, batch: DataFrame,
      urlCol: String = "url",
      expectedCorpus: Long = 1000000L): (DataFrame, Long) =
    ingestKeyed(spark, stateRoot, batch,
      md5(Urls.canonicalize(col(urlCol))), expectedCorpus)

  /** The shared exact-ingest loop over an arbitrary row-key expression
    * (`keyExpr` must be md5-shaped: a 32-hex string or null). */
  private def ingestKeyed(spark: SparkSession, stateRoot: String,
      batch: DataFrame, keyExpr: Column,
      expectedCorpus: Long): (DataFrame, Long) = {
    val stateOpt = StateTable.read(spark, stateRoot)
    val known = stateOpt match {
      case None => batch.withColumn("is_known", lit(false))
      case Some(state) =>
        // bloom over the compact state hashes, then exact verify
        Dedup.bloomPrefilterHashesKeyed(batch, state.select("h"),
          expectedCorpus, keyExpr)
    }
    // a known row whose state keeper is ITSELF is this batch replaying
    // after a crash between the state commit and the downstream effect —
    // re-accept it (idempotent replay), don't swallow it as a dup. Only
    // the (normally tiny) known subset pays the keeper-lookup join.
    val replaySelf = stateOpt match {
      case None => known.limit(0)
      case Some(state) =>
        known.filter(col("is_known"))
          .withColumn("h", keyExpr)
          .join(state.select(col("h"), col("keeper_id")), Seq("h"))
          .filter(col("keeper_id") === col("doc_id"))
          .drop("keeper_id", "h")
          .withColumn("is_known", lit(false))
    }
    // materialize ONCE before committing: the caller must see exactly the
    // rows whose hashes were written, not a lazy plan that re-reads the
    // batch source after the commit
    val hashed = known.filter(!col("is_known")).unionByName(replaySelf)
      .withColumn("h", keyExpr)
    // null text hashes to null: those rows carry no content to be a
    // duplicate OF, so each passes through as its own keeper instead of
    // all collapsing into one shared null-key window partition — and no
    // null hash is ever committed to the state table
    val deduped = hashed.filter(col("h").isNotNull)
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
    val fresh = deduped.unionByName(hashed.filter(col("h").isNull))
      .drop("is_known")
      .transform(Materialize(_))
    val version = StateTable.upsert(spark, stateRoot,
      fresh.filter(col("h").isNotNull)
        .select(col("h"), col("doc_id").as("keeper_id")), Seq("h"))
    (fresh.drop("h"), version)
  }

  /** Continuous-ingest NEAR dedup: the MinHash-LSH analog of [[ingest]].
    * The state is two compact tables under `stateRoot`:
    *   `bands/` — one (band, band_hash, keeper_id) row per accepted
    *     doc×band: the LSH index of the corpus-so-far;
    *   `sigs/`  — (keeper_id, sig): full signatures for verification.
    *
    *   1. Candidate lookup is an equi-join of the batch's band hashes
    *      against the band state — the batch only ever meets the corpus
    *      rows it shares a bucket with, never the whole corpus.
    *   2. Candidates verify against the matched keepers' stored
    *      signatures (estimated Jaccard = matching permutations /
    *      perms); ≥ `threshold` ⇒ near-duplicate of the corpus, dropped.
    *   3. Within the batch, surviving docs near-dedup against each
    *      other ([[Dedup.minhashCandidates]]); of each candidate pair
    *      the higher doc_id drops (greedy pairwise rule — cheap,
    *      deterministic; chain clusters may keep more than one member,
    *      which only costs recall, never a false drop).
    *   4. Accepted docs commit their bands and signatures atomically.
    *
    * State grows by bands+1 rows per accepted doc — independent of how
    * many duplicates arrive — and the corpus text is never re-read. */
  def ingestNear(spark: SparkSession, stateRoot: String, batch: DataFrame,
      threshold: Double = 0.8, perms: Int = 64, bands: Int = 16): (DataFrame, Long) = {
    val sigs = Dedup.minhashSignatures(batch, perms).transform(Materialize(_))
    val banded = Dedup.bandHashes(sigs, perms, bands)
    val knownDup = StateTable.read(spark, s"$stateRoot/sigs") match {
      case None => sigs.limit(0).select(col("doc_id"))
      case Some(stateSigs) =>
        val stateBands = healedBands(spark, stateRoot, stateSigs, perms, bands)
        // keeper_id == doc_id is a SELF-match: this doc's own commit from
        // a crashed attempt whose downstream effect never landed (the
        // foreachBatch replay window). Counting it as a known dup would
        // swallow the whole replayed batch — silent data loss. Filtering
        // it makes replay idempotent: same batch in ⇒ same accepted out.
        val cands = banded.join(stateBands, Seq("band", "band_hash"))
          .filter(col("doc_id") =!= col("keeper_id"))
          .select(col("doc_id"), col("keeper_id")).distinct()
        cands.join(sigs, "doc_id")
          .join(stateSigs.select(col("keeper_id"), col("sig").as("k_sig")), "keeper_id")
          .withColumn("est", size(filter(
            zip_with(col("sig"), col("k_sig"), (x, y) => x === y), eq => eq))
            / lit(perms.toDouble))
          .filter(col("est") >= threshold)
          .select("doc_id").distinct()
    }
    val corpusFresh = batch.join(knownDup, Seq("doc_id"), "left_anti")
    // in-batch pass reuses the checkpointed signatures — the
    // shingle+hash sweep must not run twice per batch
    val inBatchDrop = Dedup.candidatesFromSigs(
        sigs.join(corpusFresh.select("doc_id"), "doc_id"), perms, bands,
        minEst = threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val accepted = corpusFresh.join(inBatchDrop, Seq("doc_id"), "left_anti")
      .transform(Materialize(_))
    val accSigs = sigs.join(accepted.select("doc_id"), "doc_id")
      .select(col("doc_id").as("keeper_id"), col("sig"))
      .transform(Materialize(_))
    // sigs commit FIRST: they are the source of truth. A crash between
    // the two commits leaves bands one version behind, which the next
    // run detects and rebuilds (healedBands) — the reverse order would
    // leave band rows whose keepers have no signature, silently
    // accepting their near-dups forever.
    val version = StateTable.upsert(spark, s"$stateRoot/sigs", accSigs,
      Seq("keeper_id"))
    StateTable.upsert(spark, s"$stateRoot/bands",
      Dedup.bandHashes(accSigs.select(col("keeper_id").as("doc_id"), col("sig")),
          perms, bands)
        .select(col("band"), col("band_hash"), col("doc_id").as("keeper_id")),
      Seq("band", "band_hash", "keeper_id"))
    (accepted, version)
  }

  /** The band index, rebuilt from the signature table when a past crash
    * left it behind (bands version ≠ sigs version ⇒ the last sigs
    * commit's bands never landed — regenerate the whole index once). */
  private def healedBands(spark: SparkSession, stateRoot: String,
      stateSigs: DataFrame, perms: Int, bands: Int): DataFrame = {
    val sigsV = StateTable.latestVersion(s"$stateRoot/sigs")
    val bandsV = StateTable.latestVersion(s"$stateRoot/bands")
    if (bandsV == sigsV) StateTable.read(spark, s"$stateRoot/bands").get
    else {
      val rebuilt = Dedup.bandHashes(
          stateSigs.select(col("keeper_id").as("doc_id"), col("sig")), perms, bands)
        .select(col("band"), col("band_hash"), col("doc_id").as("keeper_id"))
      StateTable.upsert(spark, s"$stateRoot/bands", rebuilt.transform(Materialize(_)),
        Seq("band", "band_hash", "keeper_id"))
      rebuilt
    }
  }

  /** Continuous-ingest SEMANTIC dedup: the [[Similarity.semanticDedup]]
    * analog of [[ingest]]/[[ingestNear]], for embedding streams. State
    * under `stateRoot`:
    *   `centroids/` — (cid, emb): the cell structure, trained ONCE on the
    *     first batch and frozen — cells must mean the same thing across
    *     batches or the stored corpus silently changes cells under later
    *     arrivals (re-clustering is an offline index rebuild, not an
    *     ingest-path concern; same policy as a production IVF index);
    *   `kept/` — (keeper_id, cell, emb): every accepted vector, the
    *     corpus-so-far, bucketed by the state table's key shuffle.
    *
    *   1. Assign the batch to cells under the FROZEN centroids.
    *   2. Corpus check: equi-join on cell against `kept` — the batch only
    *      meets same-cell corpus vectors, never the whole store — and a
    *      rounded cosine ≥ `tau` marks a known near-dup. keeper_id ==
    *      vec_id is this batch replaying after a crash between the state
    *      commit and the downstream effect: re-accept (idempotent
    *      replay), exactly as [[ingest]] and [[ingestNear]] do.
    *   3. In-batch: within a cell the lowest id among mutual near-dups
    *      survives (keep-lowest-id, as [[Similarity.semanticDedup]]).
    *   4. Accepted vectors upsert into `kept/` atomically; a crash
    *      before the commit leaves the previous corpus intact and the
    *      batch reruns.
    *
    * Centroids commit BEFORE the first kept-commit: a crash between the
    * two leaves a trained-but-empty index, and the rerun just re-ingests
    * the batch under the same cells. Returns (accepted rows, version). */
  def ingestSemantic(spark: SparkSession, stateRoot: String, batch: DataFrame,
      tau: Double = 0.25, nCells: Int = 16, iters: Int = 1): (DataFrame, Long) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val centroids: Seq[(Int, Seq[Double])] =
      StateTable.read(spark, s"$stateRoot/centroids") match {
        case Some(st) => st.collect().map(r =>
          r.getAs[Int]("cid") -> r.getAs[scala.collection.Seq[Double]]("emb").toSeq).toSeq
        case None =>
          val trained = Similarity.ivfCentroids(batch, nCells, iters)
          // never persist an EMPTY centroid table (an empty first batch
          // trains none): freezing it would break every later ingest —
          // cells are trained-once by design, and zero cells can assign
          // nothing. Leave state absent so the next non-empty batch trains.
          if (trained.nonEmpty) {
            val schema = StructType(Seq(StructField("cid", IntegerType, false),
              StructField("emb", ArrayType(DoubleType, false), false)))
            StateTable.upsert(spark, s"$stateRoot/centroids",
              spark.createDataFrame(
                java.util.Arrays.asList(trained.map { case (cid, e) =>
                  Row(cid, e) }: _*), schema),
              Seq("cid"))
          }
          trained
      }
    // no cells (empty first batch, no prior state): nothing ingested, no
    // state written — -1 mirrors forget's "no state" version convention
    if (centroids.isEmpty)
      return (batch.select(col("vec_id"), lit(0).as("cell")).limit(0), -1L)
    val assigned = Similarity.assignCells(batch, centroids).transform(Materialize(_))
    val knownDup = StateTable.read(spark, s"$stateRoot/kept") match {
      case None => assigned.limit(0).select(col("vec_id"))
      case Some(kept) =>
        assigned.join(kept.select(col("cell"), col("keeper_id"),
            col("emb").as("k_emb")), Seq("cell"))
          .filter(col("keeper_id") =!= col("vec_id"))
          .filter(round(Similarity.cosine(col("emb"), col("k_emb")), 4) >= tau)
          .select("vec_id").distinct()
    }
    val corpusFresh = assigned.join(knownDup, Seq("vec_id"), "left_anti")
    val nb = corpusFresh.select(col("cell"), col("vec_id").as("nb_id"),
      col("emb").as("nb_emb"))
    val inBatchDrop = corpusFresh.join(nb, Seq("cell"))
      .filter(col("nb_id") < col("vec_id"))
      .filter(round(Similarity.cosine(col("emb"), col("nb_emb")), 4) >= tau)
      .select("vec_id").distinct()
    val accepted = corpusFresh.join(inBatchDrop, Seq("vec_id"), "left_anti")
      .transform(Materialize(_))
    val version = StateTable.upsert(spark, s"$stateRoot/kept",
      accepted.select(col("vec_id").as("keeper_id"), col("cell"), col("emb")),
      Seq("keeper_id"))
    (accepted.select(col("vec_id"), col("cell")), version)
  }

  /** Right-to-be-forgotten for the EXACT-dedup state ([[ingest]]):
    * remove the state rows kept by the given doc ids, so re-ingested
    * identical content is accepted again instead of matching a ghost.
    * The doomed hashes are resolved with one semi-join over the compact
    * state (hash + keeper id — never corpus text), then removed
    * bucket-incrementally ([[StateTable.delete]]). Returns the committed
    * state version (-1 when there is no state). */
  def forget(spark: SparkSession, stateRoot: String, ids: DataFrame): Long =
    StateTable.read(spark, stateRoot) match {
      case None => -1L
      case Some(state) =>
        val doomed = state.join(
            ids.select(col(ids.columns.head).as("keeper_id")), Seq("keeper_id"))
          .select("h").transform(Materialize(_))
        StateTable.delete(spark, stateRoot, doomed, Seq("h"))
    }

  /** Right-to-be-forgotten for the SEMANTIC state ([[ingestSemantic]]):
    * drops the ids' kept vectors, so later near-copies of the forgotten
    * content are accepted as new. Centroids stay — the frozen cell
    * structure carries no per-document content, only cluster means
    * trained on the first batch (re-training on deletion would silently
    * re-cell the whole surviving corpus). */
  def forgetSemantic(spark: SparkSession, stateRoot: String,
      ids: DataFrame): Long =
    StateTable.read(spark, s"$stateRoot/kept") match {
      case None => -1L
      case Some(_) =>
        StateTable.delete(spark, s"$stateRoot/kept",
          ids.select(col(ids.columns.head).as("keeper_id")).distinct()
            .transform(Materialize(_)),
          Seq("keeper_id"))
    }

  /** Right-to-be-forgotten for the NEAR-dedup state ([[ingestNear]]):
    * drops the ids' signatures AND their LSH band rows. Band rows are
    * resolved from the (healthy or healed) band index by keeper id; the
    * sigs table commits first, mirroring ingest's commit order — a crash
    * between the two leaves orphan band rows whose keepers have no
    * signature, and the candidate path tolerates those (the sig join
    * drops them) until the next ingest's heal pass rebuilds the index. */
  def forgetNear(spark: SparkSession, stateRoot: String, ids: DataFrame,
      perms: Int = 64, bands: Int = 16): Long =
    StateTable.read(spark, s"$stateRoot/sigs") match {
      case None => -1L
      case Some(stateSigs) =>
        val doomedIds = ids.select(col(ids.columns.head).as("keeper_id"))
          .distinct().transform(Materialize(_))
        val doomedBands = healedBands(spark, stateRoot, stateSigs, perms, bands)
          .join(doomedIds, Seq("keeper_id"))
          .select("band", "band_hash", "keeper_id").transform(Materialize(_))
        val v = StateTable.delete(spark, s"$stateRoot/sigs", doomedIds,
          Seq("keeper_id"))
        StateTable.delete(spark, s"$stateRoot/bands", doomedBands,
          Seq("band", "band_hash", "keeper_id"))
        v
    }
}
