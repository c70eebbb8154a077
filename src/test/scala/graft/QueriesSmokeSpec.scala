package graft

/** Every declared query runs on sf0.001 and returns a sane result.
  * (Cross-engine value equality is covered by the driver's DuckDB oracle
  * and locally by `scripts/oracle_check.py`.) */
class QueriesSmokeSpec extends SparkSpec {

  // q14b is non-empty at sf0.01 (the oracle scale) but not at sf0.001
  private val mayBeEmpty = Set("dedup_minhash_lsh", "dedup_simhash", "q14b_except")

  for (q <- Queries.all) {
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, sf("sf0.001"))
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("QDef rejects names outside [a-z0-9_] (Bench embeds them unescaped)") {
    val e = intercept[IllegalArgumentException] {
      Queries.QDef("bad\"name", (_, _) => null, None)
    }
    assert(e.getMessage.contains("[a-z0-9_]+"))
  }
}
