package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Majority-vote consensus engine.
  *
  * Reference semantics (`polla_app/pipeline.py:135-225`):
  *  - one vote per (category, value) per source; categories whose lowercase
  *    name starts with "total" are excluded (`pipeline.py:154-155`);
  *  - winner per category = value with most votes, ties broken by source
  *    registration order — first-registered source wins
  *    (`pipeline.py:163-165`, pinned by `tests/test_pipeline.py:704-748`);
  *  - disagreeing categories report losing values with their voters, in
  *    vote-count order, and `max_deviation = max(|v - winner| / winner)`
  *    (0 if winner ≤ 0), rounded to 4 (`pipeline.py:176-191`);
  *  - `missing_sources` = sources that produced a payload but lack this
  *    category (`pipeline.py:167-173`).
  *
  * Spark-first design: vote counting is a partial-aggregable `groupBy`,
  * winner selection is one window pass, and nothing leaves the executors —
  * at 100 TB this is a shuffle on `(categoria, valor)` then `categoria`,
  * both map-side combined. Python's dict-insertion-order tie-break becomes
  * the explicit `priority` column (source registration order), because a
  * distributed engine has no row order.
  *
  * Expected payload schema:
  * `source_name STRING, priority INT, montos MAP<STRING,LONG>, ...`.
  */
object Consensus {

  private def notTotal(c: Column): Column = !lower(c).startsWith("total")

  /** Explode payload maps into one row per (source, categoria, valor) vote. */
  def votes(payloads: DataFrame): DataFrame =
    payloads
      .filter(size(col("montos")) > 0)
      .select(col("source_name"), col("priority"),
        explode(col("montos")).as(Seq("categoria", "valor")))
      .filter(notTotal(col("categoria")))

  /** Per (categoria, valor): vote count, voters (registration order), best priority. */
  def voteGroups(payloads: DataFrame): DataFrame =
    votes(payloads)
      .groupBy("categoria", "valor")
      .agg(
        count(lit(1)).as("n_votes"),
        array_sort(collect_list(struct(col("priority"), col("source_name")))).as("voters_pr"),
        min("priority").as("min_priority"))
      .withColumn("voters", transform(col("voters_pr"), v => v.getField("source_name")))
      .drop("voters_pr")

  /** One row per category: winner + disagreement + missing-source report.
    *
    * Output: categoria, valor (winner), winner_sources, n_candidates,
    * disagreeing MAP<STRING,ARRAY<STRING>> (losing value → voters),
    * max_deviation DOUBLE, missing_sources ARRAY<STRING>, has_mismatch BOOLEAN.
    */
  def merge(payloads: DataFrame): DataFrame = {
    val allSources = payloads
      .filter(size(col("montos")) > 0)
      .select(array_sort(collect_list(struct(col("priority"), col("source_name")))).as("ps"))
      .select(transform(col("ps"), v => v.getField("source_name")).as("all_sources"))

    val order = Window.partitionBy("categoria")
      .orderBy(col("n_votes").desc, col("min_priority").asc)
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val enriched = voteGroups(payloads)
      .withColumn("rn", row_number().over(order))
      .withColumn("winner_valor", first("valor").over(full))
      .withColumn("winner_sources", first("voters").over(full))

    enriched
      .groupBy("categoria")
      .agg(
        first("winner_valor").as("valor"),
        first("winner_sources").as("winner_sources"),
        count(lit(1)).as("n_candidates"),
        map_from_entries(transform(
          array_sort(collect_list(when(col("rn") > 1,
            struct(col("rn"),
              col("valor").cast("string").as("k"), col("voters").as("v"))))),
          e => struct(e.getField("k").as("key"), e.getField("v").as("value"))))
          .as("disagreeing"),
        // divisor nulled when winner ≤ 0: ANSI mode would error on /0;
        // reference semantics (`pipeline.py:176-181`) = deviation 0.
        coalesce(round(max(abs(col("valor") - col("winner_valor")) /
            when(col("winner_valor") > 0, col("winner_valor").cast("double"))), 4),
          lit(0.0)).as("max_deviation"),
        array_distinct(flatten(collect_list(col("voters")))).as("responding"))
      .crossJoin(broadcast(allSources))
      .withColumn("missing_sources",
        filter(col("all_sources"), s => !array_contains(col("responding"), s)))
      .drop("responding", "all_sources")
      .withColumn("has_mismatch", size(col("disagreeing")) > 0)
  }

  /** Reference `resolved` map: one row (categoria, valor) per category. */
  def resolved(payloads: DataFrame): DataFrame =
    merge(payloads).select("categoria", "valor").orderBy("categoria")

  /** Decision scalars (`pipeline.py:383-404`): one row with
    * total_categories, mismatched_categories, mismatch_ratio, max_deviation,
    * plus confidence given the collected/expected source counts. */
  def decisionScalars(payloads: DataFrame, expectedSources: Int): DataFrame = {
    val nCollected = payloads.filter(size(col("montos")) > 0).count()
    merge(payloads)
      .agg(
        count(lit(1)).as("total_categories"),
        count_if(col("has_mismatch")).as("mismatched_categories"),
        coalesce(max(col("max_deviation")), lit(0.0)).as("max_deviation"))
      .withColumn("mismatch_ratio",
        when(col("total_categories") > 0,
          col("mismatched_categories") / col("total_categories").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("n_collected", lit(nCollected))
      .withColumn("confidence",
        when(col("n_collected") < expectedSources || col("mismatch_ratio") > 0, "degraded")
          .when(col("n_collected") === 1, "single_source")
          .otherwise("full"))
  }
}
