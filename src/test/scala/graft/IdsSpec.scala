package graft

import org.apache.spark.sql.functions._
import graft.ops.Ids

/** Stable id assignment: contiguity, order correctness, and invariance
  * to the input's partitioning — the properties monotonically_increasing_id
  * and a global-window row_number each lack (the first isn't contiguous
  * or stable, the second doesn't scale). */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("ids are 0..n-1 in key order, whatever the input partitioning") {
    val df = (0 until 500).map(i => ((i * 7919) % 500L, s"k${i % 13}"))
      .toDF("id", "grp")
    def assign(parts: Int) = Ids.stableIds(
        df.repartition(parts), sortCols = Seq("grp", "id"))
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    val a = assign(3)
    assert(a == assign(17), "ids must not depend on input partitioning")
    assert(a.values.toSeq.sorted == (0L until 500L), "ids must be contiguous")
    // order: ids ascend with the sort key
    val byId = a.toSeq.sortBy(_._2).map(_._1)
    assert(byId == byId.sorted, "id order must follow the key order")
  }

  test("graft.checkpoint.dir switches the pin to reliable checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ids-ckpt").toString
    spark.conf.set(graft.ops.Materialize.ConfKey, dir)
    try {
      val df = (0 until 100).map(i => ((i * 31) % 100L, i % 5)).toDF("id", "g")
      val out = Ids.stableIds(df, sortCols = Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(out == (0 until 100).map(i => i.toLong -> i.toLong).toMap)
      // reliable (not local) checkpointing actually wrote RDD blocks there
      assert(java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst.isPresent, "no checkpoint blocks written to the dir")
    } finally spark.conf.unset(graft.ops.Materialize.ConfKey)
  }

  test("groupRanks ≡ the five window rank functions (q36's gated branch)") {
    // the q36 footer gate picks window below 1 M events and groupRanks
    // above — this pin holds the two bit-identical on a corpus with
    // ties in `value`, multiple keys, and a 1-row key (percent_rank's
    // n=1 division guard)
    import org.apache.spark.sql.expressions.Window
    val df = ((0 until 997).map(i =>
        (i.toLong, s"t${i % 5}", (i * 7 % 13).toDouble)) :+
        (9999L, "lonely", 1.0))
      .toDF("event_id", "event_type", "value")
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val windowed = df.select(col("event_id"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      round(percent_rank().over(w), 4).as("prnk"),
      ntile(4).over(w).cast("long").as("quartile"),
      round(cume_dist().over(w), 4).as("cd"))
    val rn = col("__rn"); val n = col("__n")
    val n1 = (n - 1).cast("double")
    val bs = floor(n / 4); val rem = n % 4
    val bigCut = rem * (bs + 1)
    val quartile = when(rn <= bigCut, floor((rn - 1) / (bs + 1)) + 1)
      .otherwise(rem + floor((rn - bigCut - 1) / bs) + 1)
    val twoPhase = Ids.groupRanks(df, Seq("event_type"),
        Seq("value", "event_id"))
      .select(col("event_id"),
        rn.cast("long").as("rnk"), rn.cast("long").as("drnk"),
        round(when(n1 === 0, 0.0).otherwise((rn - 1).cast("double") / n1), 4)
          .as("prnk"),
        quartile.cast("long").as("quartile"),
        round(rn.cast("double") / n.cast("double"), 4).as("cd"))
    assert(windowed.exceptAll(twoPhase)
      .unionAll(twoPhase.exceptAll(windowed)).count() === 0L)
  }

  test("numbering never routes rows through a single partition") {
    // AQE rightly coalesces a tiny input, so pin the exchange width the
    // way a real corpus-sized caller would
    val df = (0 until 1000).map(i => (i.toLong, i % 7)).toDF("id", "g")
    val out = Ids.stableIds(df, sortCols = Seq("id"), numPartitions = Some(8))
    val partSizes = out.groupBy(spark_partition_id().as("p")).count()
      .collect().map(_.getLong(1))
    assert(partSizes.length > 1, "work collapsed to one partition")
    assert(partSizes.max < 1000, s"one partition holds everything: ${partSizes.toSeq}")
    // ids still global-contiguous across the pinned partitions
    assert(out.select("stable_id").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 1000L))
  }
}
