package graft

import org.apache.spark.sql.functions._
import graft.ops.{IncrementalDedup, StateTable}

/** Continuous-ingest dedup loop: batch 1 seeds, batch 2 drops rereads,
  * in-batch dups collapse, state versions advance atomically. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("ingest loop: cross-batch and in-batch dups drop, state advances") {
    val root = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    // batch 1: one in-batch dup pair (2 is a copy of 1)
    val (a1, v1) = IncrementalDedup.ingest(spark, root,
      docs(1L -> "alpha text", 2L -> "alpha text", 3L -> "beta text"))
    val kept1 = a1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept1 == Seq(1L, 3L)) // 2 collapsed into 1
    assert(v1 == 0L)

    // batch 2: one reread (alpha), one new, plus a dup of the new
    val (a2, v2) = IncrementalDedup.ingest(spark, root,
      docs(10L -> "alpha text", 11L -> "gamma text", 12L -> "gamma text"))
    val kept2 = a2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept2 == Seq(11L)) // alpha known, gamma keeps lowest id
    assert(v2 == 1L)

    // state holds exactly the three unique contents with first keepers
    val state = StateTable.read(spark, root).get
      .select("keeper_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(state == Seq(1L, 3L, 11L))

    // batch 3: all known → nothing accepted, version still advances
    val (a3, _) = IncrementalDedup.ingest(spark, root,
      docs(20L -> "alpha text", 21L -> "beta text", 22L -> "gamma text"))
    assert(a3.isEmpty)
  }

  test("url ingest: canonical-URL dups drop across spellings and batches") {
    val root = java.nio.file.Files.createTempDirectory("graft-urldedup").toString
    def urls(rows: (Long, String)*) = rows.toDF("doc_id", "url")
    // batch 1: two spellings of the same page + one distinct
    val (a1, v1) = IncrementalDedup.ingestByUrl(spark, root, urls(
      1L -> "https://s.io/p?x=1&utm_source=f",
      2L -> "HTTPS://S.IO:443/p/?x=1",
      3L -> "https://s.io/q"))
    assert(a1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    assert(v1 == 0L)
    // batch 2: yet another spelling of p -> known; genuinely new -> kept
    val (a2, _) = IncrementalDedup.ingestByUrl(spark, root, urls(
      10L -> "https://s.io/p?x=1#frag",
      11L -> "https://s.io/r"))
    assert(a2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(11L))
    // replay of a committed keeper re-accepts (idempotent crash recovery)
    val (a3, _) = IncrementalDedup.ingestByUrl(spark, root, urls(
      1L -> "https://s.io/p?x=1&utm_source=f"))
    assert(a3.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("graft.checkpoint.dir makes the ingest pins reliable checkpoints") {
    // the cluster path: every localCheckpoint in the loop becomes a
    // reliable checkpoint, and the loop's semantics are unchanged
    val root = java.nio.file.Files.createTempDirectory("graft-inc-rel").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-inc-ckpt").toString
    spark.conf.set(graft.ops.Materialize.ConfKey, ckpt)
    try {
      val (a1, _) = IncrementalDedup.ingest(spark, root,
        docs(1L -> "alpha text", 2L -> "alpha text", 3L -> "beta text"))
      assert(a1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 3L))
      val (a2, _) = IncrementalDedup.ingest(spark, root,
        docs(10L -> "alpha text", 11L -> "gamma text"))
      assert(a2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(11L))
      assert(java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst.isPresent, "no reliable checkpoint blocks written")
    } finally spark.conf.unset(graft.ops.Materialize.ConfKey)
  }

  test("replaying a committed batch re-accepts identically (exact + near)") {
    // the foreachBatch replay window: state committed, downstream effect
    // lost, same batch re-runs. Accepted set must be IDENTICAL — a doc
    // matching its own crashed-attempt commit is replay, not a dup.
    val rootE = java.nio.file.Files.createTempDirectory("graft-replay-e").toString
    val batchE = docs(1L -> "alpha text", 2L -> "alpha text", 3L -> "beta text")
    val (e1, _) = IncrementalDedup.ingest(spark, rootE, batchE)
    val (e2, _) = IncrementalDedup.ingest(spark, rootE, batchE)
    assert(e1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(e2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // a true cross-batch dup (different id, same text) still drops
    val (e3, _) = IncrementalDedup.ingest(spark, rootE, docs(9L -> "alpha text"))
    assert(e3.isEmpty)
    // state stayed clean: one row per unique content, original keepers
    assert(StateTable.read(spark, rootE).get
      .select("keeper_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))

    val rootN = java.nio.file.Files.createTempDirectory("graft-replay-n").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"oth$i").mkString(" ")
    val batchN = docs(1L -> base, 2L -> other)
    val (n1, _) = IncrementalDedup.ingestNear(spark, rootN, batchN)
    val (n2, _) = IncrementalDedup.ingestNear(spark, rootN, batchN)
    assert(n1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(n2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // a genuine near-dup under a different id still drops
    val near = ((1 to 39).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val (n3, _) = IncrementalDedup.ingestNear(spark, rootN, docs(9L -> near))
    assert(n3.isEmpty)
  }

  test("near-dedup ingest: in-batch, cross-batch via LSH state, distinct kept") {
    val root = java.nio.file.Files.createTempDirectory("graft-incnear").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearA = ((1 to 39).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val distinct1 = (1 to 40).map(i => s"other$i").mkString(" ")
    // batch 1: base, an in-batch near-dup of it, and a distinct doc
    val (a1, v1) = IncrementalDedup.ingestNear(spark, root,
      docs(1L -> base, 2L -> nearA, 3L -> distinct1))
    val kept1 = a1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept1 == Seq(1L, 3L), s"in-batch near-dup not dropped: $kept1")
    assert(v1 == 0L)
    // batch 2: a near-dup of batch-1's base (caught via STATE, the text
    // itself is long gone) plus a genuinely new doc
    val nearB = ("FIRST" +: (2 to 40).map(i => s"tok$i")).mkString(" ")
    val distinct2 = (1 to 40).map(i => s"fresh$i").mkString(" ")
    val (a2, v2) = IncrementalDedup.ingestNear(spark, root,
      docs(10L -> nearB, 11L -> distinct2))
    val kept2 = a2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept2 == Seq(11L), s"cross-batch near-dup not dropped: $kept2")
    assert(v2 == 1L)
    // state carries one signature per ACCEPTED doc only
    val keepers = StateTable.read(spark, s"$root/sigs").get
      .select("keeper_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keepers == Seq(1L, 3L, 11L))
    // batch 3: exact re-ingest of an accepted doc → dropped
    val (a3, _) = IncrementalDedup.ingestNear(spark, root, docs(20L -> distinct2))
    assert(a3.isEmpty)
  }

  test("incremental stats: additive across batches, replay applies exactly once") {
    import spark.implicits._
    import graft.ops.IncrementalStats
    val root = java.nio.file.Files.createTempDirectory("graft-incstats").toString
    def langDocs(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "lang", "text")
    val b1 = langDocs((1L, "en", "one two three"), (2L, "en", "four five"),
      (3L, "es", "uno dos"))
    val s1 = IncrementalStats.update(spark, root, b1, batchId = 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s1("en") == ((2L, 5L)) && s1("es") == ((1L, 2L)), s1)
    // batch 2 adds to en, introduces fr
    val b2 = langDocs((10L, "en", "six"), (11L, "fr", "un deux trois"))
    val s2 = IncrementalStats.update(spark, root, b2, batchId = 2L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s2("en") == ((3L, 6L)) && s2("fr") == ((1L, 3L)) &&
      s2("es") == ((1L, 2L)), s2)
    // replaying batch 2 (crash-recovery path) must NOT double-count
    val s3 = IncrementalStats.update(spark, root, b2, batchId = 2L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s3 == s2, s"replay double-counted: $s3")
  }

  test("forget: erased content re-ingests as new; others still dedupe (exact)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-forget").toString
    IncrementalDedup.ingest(spark, root,
      docs(1L -> "alpha text", 2L -> "beta text", 3L -> "gamma text"))
    val v = IncrementalDedup.forget(spark, root, Seq(1L).toDF("doc_id"))
    assert(v > 0L)
    // alpha's state row is gone: identical content is accepted again;
    // beta is untouched and still matches
    val (a, _) = IncrementalDedup.ingest(spark, root,
      docs(10L -> "alpha text", 11L -> "beta text"))
    val kept = a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(10L), s"forget must erase exactly doc 1's ghost: $kept")
    // state now keeps the re-ingested copy under its new keeper
    val keepers = StateTable.read(spark, root).get
      .select("keeper_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keepers == Seq(2L, 3L, 10L))
    // forgetting an unknown id is a clean no-op
    IncrementalDedup.forget(spark, root, Seq(999L).toDF("doc_id"))
    assert(StateTable.read(spark, root).get.count() == 3)
  }

  test("forgetNear: signatures AND band rows go; near-dups re-accept") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-forgetnear").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val distinct1 = (1 to 40).map(i => s"other$i").mkString(" ")
    IncrementalDedup.ingestNear(spark, root, docs(1L -> base, 2L -> distinct1))
    IncrementalDedup.forgetNear(spark, root, Seq(1L).toDF("doc_id"))
    // no band row may still reference keeper 1 (a sig-only delete would
    // leave ghost candidates)
    val bandKeepers = StateTable.read(spark, s"$root/bands").get
      .select("keeper_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!bandKeepers.contains(1L), s"band ghosts survived: $bandKeepers")
    // a near-dup of the forgotten doc is accepted; dup of kept doc drops
    val nearBase = ("FIRST" +: (2 to 40).map(i => s"tok$i")).mkString(" ")
    val (a, _) = IncrementalDedup.ingestNear(spark, root,
      docs(10L -> nearBase, 11L -> distinct1))
    val kept = a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(10L), s"got $kept")
  }

  test("forgetSemantic: kept vectors go, cells stay, near-copies re-accept") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-forgetsem").toString
    def vecs(rows: (Long, Seq[Double])*) = rows.toDF("vec_id", "embedding")
    IncrementalDedup.ingestSemantic(spark, root,
      vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)), tau = 0.9, nCells = 1)
    IncrementalDedup.forgetSemantic(spark, root, Seq(1L).toDF("vec_id"))
    // a near-copy of the forgotten vector is new again; a near-copy of
    // the surviving one still drops
    val (a, _) = IncrementalDedup.ingestSemantic(spark, root,
      vecs(10L -> Seq(0.99, 0.01), 11L -> Seq(0.01, 0.99)),
      tau = 0.9, nCells = 1)
    val kept = a.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(10L), s"got $kept")
    // the frozen cell structure survives deletion
    assert(StateTable.read(spark, s"$root/centroids").get.count() == 1)
  }

  test("semantic ingest: an empty FIRST batch must not freeze empty cells") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-incsem-empty").toString
    def vecs(rows: (Long, Seq[Double])*) = rows.toDF("vec_id", "embedding")
    // empty first batch: nothing accepted, version -1, and — critically —
    // NO centroid state persisted (an empty frozen cell structure would
    // make every later assignCells impossible, forever)
    val (a0, v0) = IncrementalDedup.ingestSemantic(spark, root,
      vecs(), tau = 0.9, nCells = 1)
    assert(a0.isEmpty && v0 == -1L)
    assert(StateTable.read(spark, s"$root/centroids").isEmpty,
      "empty batch persisted an empty centroid table")
    // the next (non-empty) batch trains cells and ingests normally
    val (a1, _) = IncrementalDedup.ingestSemantic(spark, root,
      vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.99, 0.01)), tau = 0.9, nCells = 1)
    assert(a1.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(StateTable.read(spark, s"$root/centroids").get.count() == 1)
  }

  test("near-dedup heals a band index left behind by a crash") {
    val root = java.nio.file.Files.createTempDirectory("graft-incnear-heal").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val (a1, _) = IncrementalDedup.ingestNear(spark, root, docs(1L -> base))
    assert(a1.count() == 1)
    // simulate the crash window: sigs committed, the bands commit lost —
    // roll the bands table back to "nothing"
    def rmTree(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally s.close()
    }
    rmTree(s"$root/bands")
    assert(StateTable.read(spark, s"$root/bands").isEmpty)
    // a near-dup of the committed doc MUST still be caught: the index is
    // rebuilt from the signature table (the source of truth)
    val near = ((1 to 39).map(i => s"tok$i") :+ "EDIT").mkString(" ")
    val (a2, _) = IncrementalDedup.ingestNear(spark, root, docs(2L -> near))
    assert(a2.isEmpty, "healed index failed to catch a known near-dup")
    assert(StateTable.read(spark, s"$root/bands").nonEmpty)
  }

  test("null-text rows each pass through; null never enters the hash state") {
    val root = java.nio.file.Files.createTempDirectory("graft-incdedup-null").toString
    val (a1, _) = IncrementalDedup.ingest(spark, root,
      docs(1L -> null, 2L -> null, 3L -> "real text"))
    // null text is not 'duplicate content': both rows survive, not just
    // the lowest id
    val kept = a1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L))
    // state only carries the real content hash
    val state = StateTable.read(spark, root).get.collect()
    assert(state.length == 1 && state.head.getAs[Long]("keeper_id") == 3L)
    // a later null-text row is still accepted (nothing 'known' about null)
    val (a2, _) = IncrementalDedup.ingest(spark, root,
      docs(10L -> null, 11L -> "real text"))
    assert(a2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("semantic ingest: cross-batch and in-batch near-dups drop under frozen cells") {
    val root = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    // batch 1: 2 is a near-copy of 1; 3 orthogonal. nCells=1 => pure
    // pairwise within the single cell.
    val (a1, v1) = IncrementalDedup.ingestSemantic(spark, root,
      vecs(1L -> Seq(1.0, 0.0, 0.0), 2L -> Seq(0.99, 0.01, 0.0),
        3L -> Seq(0.0, 1.0, 0.0)),
      tau = 0.9, nCells = 1, iters = 0)
    assert(a1.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    assert(v1 == 0L)

    // batch 2: 10 near-dups corpus vector 1 (dropped); 11 novel axis
    val (a2, v2) = IncrementalDedup.ingestSemantic(spark, root,
      vecs(10L -> Seq(0.98, 0.02, 0.0), 11L -> Seq(0.0, 0.0, 1.0)),
      tau = 0.9, nCells = 1, iters = 0)
    assert(a2.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(11L))
    assert(v2 == 1L)

    // the kept store is exactly the three survivors
    val kept = StateTable.read(spark, s"$root/kept").get
      .select("keeper_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 11L))

    // centroids are FROZEN: trained once at version 0, never rewritten
    assert(StateTable.latestVersion(s"$root/centroids").contains(0L))
  }

  test("semantic ingest replay: a committed batch re-accepts identically") {
    val root = java.nio.file.Files.createTempDirectory("graft-semreplay").toString
    val batch = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    val (a1, _) = IncrementalDedup.ingestSemantic(spark, root, batch,
      tau = 0.9, nCells = 1, iters = 0)
    // crash window: state committed, downstream effect lost, same batch
    // re-runs. Self-matches in the kept store are replay, not dups.
    val (a2, _) = IncrementalDedup.ingestSemantic(spark, root, batch,
      tau = 0.9, nCells = 1, iters = 0)
    assert(a1.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq ==
      a2.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq)
    // and the store did not grow
    assert(StateTable.read(spark, s"$root/kept").get.count() == 2L)
  }
}
