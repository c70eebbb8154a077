package graft

/** Fixed, declared schemas for the pipeline's record types (SURVEY §1.1).
  * The reference flows schema-implicit dicts; here every artifact is a
  * case class with a Spark Encoder, so JSONL artifacts round-trip through
  * `spark.read.schema(...).json` and `Dataset.toJSON`.
  */
object Model {

  /** Raw fetch payload (reference `sources/pozos.py:248-257`). */
  case class SourcePayload(
      source_name: String,
      priority: Int,
      fuente: String,
      fetched_at: String,
      sha256: Option[String],
      estimado: Boolean,
      montos: Map[String, Long],
      user_agent: Option[String],
      sorteo: Option[Long],
      fecha: Option[String])

  /** Provenance descriptor (reference `pipeline.py:208-216`). */
  case class SourceDesc(
      fuente: Option[String],
      fetched_at: Option[String],
      sha256: Option[String],
      user_agent: Option[String],
      estimado: Boolean,
      sorteo: Option[Long],
      fecha: Option[String])

  object SourceDesc {
    def of(p: SourcePayload): SourceDesc = SourceDesc(
      Some(p.fuente), Some(p.fetched_at), p.sha256, p.user_agent,
      p.estimado, p.sorteo, p.fecha)
  }

  case class PozosProvenance(primary: SourceDesc, alternatives: Seq[SourceDesc])
  case class Provenance(pozos: PozosProvenance)

  case class Premio(categoria: String, premio_clp: Long, ganadores: Long)

  /** Normalized record (reference `pipeline.py:409-417`); also the state
    * record (`pipeline.py:437`). */
  case class NormalizedRecord(
      sorteo: Option[Long],
      fecha: Option[String],
      fuente: Option[String],
      confidence: String,
      premios: Seq[Premio],
      pozos_proximo: Map[String, Long],
      provenance: Provenance)

  /** Mismatch entry (reference `pipeline.py:183-191`). */
  case class Mismatch(
      categoria: String,
      consensus: Map[String, Seq[String]],
      disagreeing: Map[String, Seq[String]],
      max_deviation: Option[Double],
      missing_sources: Seq[String])

  case class RunInfo(id: String, generated_at: String, sources: Seq[String],
      timeout: Int, retries: Int, fail_fast: Boolean)
  case class LastDraw(sorteo: Option[Long], fecha: Option[String])
  case class Decision(status: String, confidence: String,
      total_categories: Long, mismatched_categories: Long, reason: String)

  /** Comparison report (reference `pipeline.py:288-323`). */
  case class Report(run: RunInfo, last_draw: LastDraw, decision: Decision,
      mismatches: Seq[Mismatch], api_version: String)

  /** Run summary (reference `pipeline.py:326-349`). */
  case class Summary(run_id: String, generated_at: String, decision: Decision,
      prizes_changed: Boolean, publish: Boolean, publish_reason: String,
      api_version: String)

  val ApiVersion = "v1.2"
}
