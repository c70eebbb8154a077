package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is for
  * the pathological ones (a handful of keys holding >10% of a 100 TB
  * fact). The fact side gets a deterministic salt derived from a row
  * identity column (NOT `rand()` — retries/speculative tasks must agree),
  * the dim side is exploded `saltBuckets`×, and the join key becomes
  * (key, salt): one hot partition becomes `saltBuckets` even ones at the
  * cost of a `saltBuckets`× dim replication — cheap when the dim is small,
  * which is exactly the skewed-join case.
  */
object Skew {

  /** Equi-join `facts ⋈ dims` on `key`, salted `saltBuckets` ways.
    * `factId` must be any column making fact rows distinct-ish (salt
    * uniformity, not correctness, depends on it). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
      factId: Column, saltBuckets: Int = 8,
      joinType: String = "inner"): DataFrame = {
    val salted = facts.withColumn("_salt", pmod(xxhash64(factId), lit(saltBuckets)))
    val exploded = dims
      .withColumn("_salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top skewed keys with their share of rows — the diagnostic that
    * decides whether salting is warranted. */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 4))
      .orderBy(col("n").desc)
      .limit(topK)
  }
}
