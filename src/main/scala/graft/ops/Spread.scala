package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Ensure a frame enters an expensive per-row map stage (tokenize /
  * shingle / hash / feature-extract) with at least the cluster's slot
  * count of partitions.
  *
  * Locally the driver testdata is one unsplittable parquet row group, so
  * a corpus sweep otherwise runs its whole map side in ONE task
  * (measured ~1 s serial stages on the containment and n-gram benches).
  * At real scale the input is already wider than the slot count and this
  * is a no-op — the repartition only fires when the scan arrives
  * narrower than half the available slots, so it never ADDS a shuffle to
  * a well-partitioned 100 TB input. */
object Spread {
  def wide(df: DataFrame, key: Option[Column] = None): DataFrame = {
    // a streaming frame has no .rdd to inspect (and its micro-batches
    // get their parallelism from the source); ops called on streaming
    // input — signatures under foreachBatch receive BATCH frames, but a
    // direct streaming caller must pass through untouched, not throw
    if (df.isStreaming) return df
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots / 2)
      key.fold(df.repartition(slots))(k => df.repartition(slots, k))
    else df
  }
}
