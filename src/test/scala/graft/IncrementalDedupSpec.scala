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
}
