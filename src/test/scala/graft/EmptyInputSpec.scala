package graft

/** Every declared query degrades gracefully on ZERO-ROW tables.
  *
  * Why this matters at 100 TB: a selective pushed-down filter, a pruned
  * partition, or an early date boundary routinely leaves an operator with
  * an empty input — and a driver-side `.head()`/`collect()(0)` on a
  * control-plane artifact (centroids, codebooks, vocab, winner row) is
  * exactly where that turns into a `NoSuchElementException` in production.
  * The smoke suite (QueriesSmokeSpec) can never catch this: sf0.001 is
  * small but nowhere near empty.
  *
  * Contract pinned here: `fn(spark, emptyDir)` must BUILD (no exception at
  * plan time) and EXECUTE (no exception at collect time). Row counts are
  * not asserted — an empty result, an all-null summary row, or a zero
  * datasheet are all acceptable; throwing is not.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    // limit(0) of the real sf0.001 scans: identical column names AND
    // physical types (decimals, the events ts encoding) with zero rows.
    Tables.names.foreach { n =>
      Tables.load(spark, sf("sf0.001"), n).limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  for (q <- Queries.all) {
    test(s"${q.name} executes on empty tables") {
      q.fn(spark, emptyDir).collect()
    }
  }
}
