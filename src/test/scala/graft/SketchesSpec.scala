package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sketches, SketchAggregators}

/** KMV distinct sketch: exactness below k, merge ≡ union, estimate
  * accuracy, and the bounded-buffer aggregation shape. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  test("below k the sketch is the exact distinct set (estimate exact)") {
    val df = Seq.tabulate(200)(i => ("g", i.toLong % 40)).toDF("g", "v")
    val out = Sketches.kmvPerGroup(df, Seq("g"), "v", K)
      .select(size(col("kmv")).as("n"),
        Sketches.kmvEstimate(col("kmv"), K).as("est"))
      .collect().head
    assert(out.getInt(0) == 40 && out.getDouble(1) == 40.0)
  }

  test("sketch holds the k SMALLEST distinct hashes, sorted") {
    val vals = (1L to 500L)
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val got = Sketches.kmvPerGroup(df, Seq("g"), "v", K)
      .select(col("kmv")).collect().head.getSeq[Long](0)
    val expected = vals.map(v =>
      df.sparkSession.range(1).select(Sketches.kmvHash(lit(v))).collect().head.getLong(0))
    assert(got == expected.distinct.sorted.take(K))
  }

  test("merged sketches equal the sketch of the union; estimate within 20%") {
    val a = (1L to 3000L).map(v => ("a", v)).toDF("g", "v")
    val b = (2000L to 5000L).map(v => ("b", v)).toDF("g", "v")
    val sa = Sketches.kmvPerGroup(a, Seq("g"), "v", K).select(col("kmv").as("ka"))
    val sb = Sketches.kmvPerGroup(b, Seq("g"), "v", K).select(col("kmv").as("kb"))
    val direct = Sketches.kmvPerGroup(
      a.unionByName(b).withColumn("g", lit("u")), Seq("g"), "v", K)
      .select(col("kmv")).collect().head.getSeq[Long](0)
    val row = sa.crossJoin(sb).select(
      Sketches.kmvMerge(col("ka"), col("kb"), K).as("m"),
      Sketches.kmvEstimate(Sketches.kmvMerge(col("ka"), col("kb"), K), K).as("est"))
      .collect().head
    assert(row.getSeq[Long](0) == direct, "merge != sketch of union")
    val est = row.getDouble(1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.20, s"union estimate $est vs 5000")
  }

  test("aggregator buffer is bounded at k and inputs dedupe") {
    val agg = SketchAggregators.kmv(8)
    var buf = agg.zero
    val inputs = Seq(5L, 3L, 9L, 3L, 1L, 7L, 11L, 2L, 8L, 6L, 4L, 5L, 0L)
    inputs.foreach(h => buf = agg.reduce(buf, h))
    assert(buf.m.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)) // 8 smallest, sorted
    val other = agg.zero
    val merged = agg.merge(buf, agg.reduce(other, -1L))
    assert(merged.m.toSeq == Seq(-1L, 0L, 1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("CMS heavy hitters: exact top-k order, estimates within the eps bound") {
    import spark.implicits._
    val rows = (Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      Seq.fill(30)("bets") ++ (0 until 40).map(i => s"rare$i")).toDF("w")
    val out = graft.ops.Sketches.cmsHeavyHitters(rows, "w", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // frequency order with value tiebreak (beta before bets)
    assert(out.map(x => (x._1, x._2)).toSeq ==
      Seq(("alpha", 50L), ("beta", 30L), ("bets", 30L)))
    assert(out.forall(_._3), s"sketch out of bounds: ${out.toSeq}")
    // nulls are not counted
    val withNull = rows.unionAll(Seq.fill(5)(null: String).toDF("w"))
    assert(graft.ops.Sketches.cmsHeavyHitters(withNull, "w", k = 1)
      .collect().head.getLong(1) == 50L)
  }
}
