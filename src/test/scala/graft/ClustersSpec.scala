package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Connected-components cluster assignment. */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain, triangle, and disjoint pair resolve to min ids") {
    // chain 1-2-3-4 (transitive), triangle 10-11-12, pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("u", "v")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (multi-round propagation)") {
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("u", "v")
    val got = Dedup.connectedComponents(edges).collect()
    assert(got.length == n && got.forall(_.getLong(1) == 1L))
  }

  test("clusters: singletons kept, keeper is the min id, sizes correct") {
    val docs = Seq(1L, 2L, 3L, 7L, 9L).map(id => (id, s"text $id")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(docs, pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (7L, 7L, 1L, true), (9L, 9L, 1L, true)))
  }
}
