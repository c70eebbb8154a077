package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.{Consensus, StatePipeline}

/** Consensus semantics pinned by the reference
  * (`tests/test_consensus.py:10-128`, `tests/test_pipeline.py:642-748`). */
class ConsensusSpec extends SparkSpec {
  import SourceStubs.schema

  private def payloads(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private def row(src: String, prio: Int, montos: Map[String, Long]) =
    Row(src, prio, s"https://$src.cl/", s"sha-$src", true, montos, 5417L, "2026-04-26")

  test("majority vote wins") {
    val df = payloads(
      row("a", 0, Map("Loto" -> 1000L)),
      row("b", 1, Map("Loto" -> 1000L)),
      row("c", 2, Map("Loto" -> 1200L)))
    val m = Consensus.merge(df).collect().head
    assert(m.getAs[Long]("valor") == 1000L)
    assert(m.getAs[scala.collection.Seq[String]]("winner_sources").toSeq == Seq("a", "b"))
    assert(m.getAs[Boolean]("has_mismatch"))
    // max_deviation = |1200-1000|/1000 = 0.2
    assert(math.abs(m.getAs[Double]("max_deviation") - 0.2) < 1e-9)
  }

  test("tie broken by registration order: first-registered source wins") {
    val df = payloads(
      row("first", 0, Map("Loto" -> 111L)),
      row("second", 1, Map("Loto" -> 222L)))
    val m = Consensus.merge(df).collect().head
    assert(m.getAs[Long]("valor") == 111L)
  }

  test("total* categories are excluded from voting") {
    val df = payloads(row("a", 0, Map("Loto" -> 10L, "Total estimado" -> 99L)))
    val cats = Consensus.resolved(df).collect().map(_.getString(0)).toSet
    assert(cats == Set("Loto"))
  }

  test("missing sources reported per category") {
    val df = payloads(
      row("a", 0, Map("Loto" -> 10L, "Recargado" -> 5L)),
      row("b", 1, Map("Loto" -> 10L)))
    val byCat = Consensus.merge(df).collect()
      .map(r => r.getAs[String]("categoria") ->
        r.getAs[scala.collection.Seq[String]]("missing_sources").toSeq).toMap
    assert(byCat("Loto") == Seq())
    assert(byCat("Recargado") == Seq("b"))
  }

  test("zero-valued winner → max_deviation 0 (no division by zero)") {
    val df = payloads(
      row("a", 0, Map("Jubilazo" -> 0L)),
      row("b", 1, Map("Jubilazo" -> 0L, "Otro" -> 5L)))
    val m = Consensus.merge(df).collect()
      .map(r => r.getAs[String]("categoria") -> r.getAs[Double]("max_deviation")).toMap
    assert(m("Jubilazo") == 0.0)
  }

  test("decision scalars + confidence") {
    val agree = payloads(
      row("a", 0, Map("Loto" -> 10L)), row("b", 1, Map("Loto" -> 10L)))
    val full = Consensus.decisionScalars(agree, expectedSources = 2).collect().head
    assert(full.getAs[String]("confidence") == "full")
    assert(full.getAs[Double]("mismatch_ratio") == 0.0)

    val solo = Consensus.decisionScalars(
      payloads(row("a", 0, Map("Loto" -> 10L))), expectedSources = 1).collect().head
    assert(solo.getAs[String]("confidence") == "single_source")

    val disagree = Consensus.decisionScalars(payloads(
      row("a", 0, Map("Loto" -> 10L)), row("b", 1, Map("Loto" -> 12L))),
      expectedSources = 2).collect().head
    assert(disagree.getAs[String]("confidence") == "degraded")
    assert(disagree.getAs[Double]("mismatch_ratio") == 1.0)
  }

  test("disagreeing map lists losing values with voters in vote order") {
    val df = payloads(
      row("a", 0, Map("Loto" -> 1000L)),
      row("b", 1, Map("Loto" -> 1000L)),
      row("c", 2, Map("Loto" -> 1200L)))
    val m = Consensus.merge(df).collect().head
    val dis = m.getAs[Map[String, Seq[String]]]("disagreeing")
    assert(dis == Map("1200" -> Seq("c")))
  }

  test("decision matrix (skip/quarantine/publish/publish_forced)") {
    assert(StatePipeline.decide(unchanged = true, 0.0, 0.0) ==
      (("skip", false, "sorteo_fecha_and_amounts_unchanged")))
    assert(StatePipeline.decide(unchanged = false, 0.3, 0.0)._1 == "quarantine")
    assert(StatePipeline.decide(unchanged = false, 0.0, 0.2)._1 == "quarantine")
    assert(StatePipeline.decide(unchanged = false, 0.1, 0.05) ==
      (("publish", true, "updated_or_new_amounts")))
    assert(StatePipeline.decide(unchanged = true, 0.0, 0.0, forcePublish = true) ==
      (("publish_forced", true, "force_publish_requested")))
    // quarantine beats force when data actually changed
    assert(StatePipeline.decide(unchanged = false, 0.9, 0.0, forcePublish = true)._1 ==
      "quarantine")
  }

  test("change detection: sha short-circuit, null-safe keys, map equality") {
    import spark.implicits._
    val cur = Seq(
      (Some(1L), "2026-01-01", "sha-a", Map("Loto" -> 10L)),
      (Some(2L), "2026-01-02", "sha-x", Map("Loto" -> 20L)),
      (Option.empty[Long], "2026-01-03", "sha-n", Map("Loto" -> 30L)),
      (Some(4L), "2026-01-04", "sha-zz", Map("Loto" -> 40L)))
      .toDF("sorteo", "fecha", "sha256", "pozos_proximo")
    val st = Seq(
      (Some(1L), "2026-01-01", "sha-a", Map("Loto" -> 99L)),   // sha match → unchanged
      (Some(2L), "2026-01-02", "sha-y", Map("Loto" -> 20L)),   // amounts match → unchanged
      (Option.empty[Long], "2026-01-03", "other", Map("Loto" -> 30L)), // null keys match
      (Some(4L), "2026-01-04", "sha-q", Map("Loto" -> 41L)))   // differs → changed
      .toDF("sorteo", "fecha", "sha256", "pozos_proximo")
    val got = StatePipeline.withUnchanged(cur, st)
      .select("fecha", "unchanged").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map(
      "2026-01-01" -> true, "2026-01-02" -> true,
      "2026-01-03" -> true, "2026-01-04" -> false))
  }

  test("no state match → changed") {
    import spark.implicits._
    val cur = Seq((Some(9L), "2026-02-01", "s", Map("Loto" -> 1L)))
      .toDF("sorteo", "fecha", "sha256", "pozos_proximo")
    val st = Seq((Some(1L), "2026-01-01", "s", Map("Loto" -> 1L)))
      .toDF("sorteo", "fecha", "sha256", "pozos_proximo")
    assert(!StatePipeline.withUnchanged(cur, st).collect().head.getAs[Boolean]("unchanged"))
  }
}
