package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set is small and `broadcast()` — the corpus is
  * scanned exactly once, with per-row arithmetic in higher-order functions
  * (no UDF, no driver collect). Top-k uses a window per query id; at scale
  * replace with per-partition top-k + final merge (same plan shape Spark
  * derives for `ORDER BY ... LIMIT k` via TakeOrderedAndProject).
  *
  * The IVF variant buckets vectors by the sign pattern of the first
  * `signBits` dimensions (a fixed random-hyperplane-style partition) and
  * probes only the query's bucket: the join becomes an equi-join on the
  * bucket id, shuffling 1/2^signBits of the pairs.
  */
object Similarity {

  /** Sequential-fold dot product — same accumulation order every engine
    * uses for a plain loop, so results are bit-stable. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: every query vector against the whole corpus.
    * Output: q_id, c_id, sim (rounded 4), rank. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
    val c = corpus.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(cosine(col("q_emb"), col("c_emb")), 4).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sign-pattern bucket id over the first `signBits` dimensions. */
  def signBucket(emb: Column, signBits: Int = 8): Column =
    (0 until signBits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(when(emb.getItem(i) >= 0, lit(1L << i)).otherwise(lit(0L)))
    }

  /** IVF/LSH-bucketed ANN: probe only the query's sign bucket. */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
      signBits: Int = 8): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"),
      asDouble(col("embedding")).as("q_emb"))
      .withColumn("bucket", signBucket(col("q_emb"), signBits))
    val c = corpus.select(col("vec_id").as("c_id"),
      asDouble(col("embedding")).as("c_emb"))
      .withColumn("bucket", signBucket(col("c_emb"), signBits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(cosine(col("q_emb"), col("c_emb")), 4).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
