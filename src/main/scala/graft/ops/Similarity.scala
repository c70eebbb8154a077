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
    * uses for a plain loop, so results are bit-stable. Codegen'd native
    * expression ([[graft.functions.VecDot]]); [[dotHof]] is the
    * higher-order-function form it replaced (kept for the equivalence
    * spec — the HOF is interpreted per row and breaks whole-stage
    * codegen on the pair-scoring hot path). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  /** HOF formulation of [[dot]]; bit-identical, ~interpreted. */
  def dotHof(a: Column, b: Column): Column =
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

  /** IVF index: `k` centroids seeded from the first vectors (by vec_id,
    * deterministic) and refined with `iters` Lloyd steps — all as
    * DataFrame aggregations; only the k×dim centroid matrix ever reaches
    * the driver. */
  def ivfCentroids(corpus: DataFrame, k: Int = 16, iters: Int = 1): Seq[(Int, Seq[Double])] = {
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    var centroids: Seq[(Int, Seq[Double])] = c.orderBy("vec_id").limit(k).collect()
      .zipWithIndex.map { case (r, i) =>
        i -> r.getAs[scala.collection.Seq[Double]]("emb").toSeq
      }.toSeq
    for (_ <- 0 until iters) {
      val assigned = c.withColumn("cid", assignExpr(col("emb"), centroids))
      // mean per cluster = elementwise sum / count, via posexplode (codegen)
      val means = assigned
        .select(col("cid"), posexplode(col("emb")).as(Seq("i", "x")))
        .groupBy("cid", "i").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("im"))
        .select(col("cid"), transform(col("im"), e => e.getField("m")).as("mean"))
        .collect()
        .map(r => r.getInt(0) -> r.getAs[scala.collection.Seq[Double]]("mean").toSeq)
      // clusters that lost all members keep their previous centroid
      val byId = means.toMap
      centroids = centroids.map { case (cid, prev) => cid -> byId.getOrElse(cid, prev) }
    }
    centroids
  }

  /** argmin over centroid squared distances, as a single expression. */
  private def assignExpr(emb: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val scored = centroids.map { case (cid, cvec) =>
      val d = graft.functions.VectorExprs.sqDist(emb, typedlit(cvec))
      struct(d.as("d"), lit(cid).as("c"))
    }
    least(scored: _*).getField("c")
  }

  /** IVF ANN: assign corpus to centroids once, probe the query's `nprobe`
    * nearest cells. The probe join is an equi-join on cell id — at 100 TB
    * the corpus assignment is a write-once preprocessing column and each
    * query touches nprobe/k of the data. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
      nCells: Int = 16, nprobe: Int = 2, iters: Int = 1): DataFrame = {
    val centroids = ivfCentroids(corpus, nCells, iters)
    val c = corpus.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
      .withColumn("cell", assignExpr(col("c_emb"), centroids))
    val probes = centroids.map { case (cid, cvec) =>
      val d = graft.functions.VectorExprs.sqDist(col("q_emb"), typedlit(cvec))
      struct(d.as("d"), lit(cid).as("c"))
    }
    val q = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
      .withColumn("cell",
        explode(transform(slice(array_sort(array(probes: _*)), 1, nprobe),
          s => s.getField("c"))))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(cosine(col("q_emb"), col("c_emb")), 4).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
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
