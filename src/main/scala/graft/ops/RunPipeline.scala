package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Model._
import graft.sources.PozoSource

/** EP1 — the ingest pipeline (reference `pipeline.py:352-528`, traced in
  * SURVEY §3).
  *
  * Spark-first split: fetch is driver-orchestrated (2 stateful sources —
  * the reference is the same), everything set-shaped (consensus, scalars,
  * change detection) runs as DataFrame ops, and the single-record
  * control-plane artifacts (normalized/state/report/summary JSONL) are
  * written atomically (temp+rename — the reference truncate-writes,
  * `pipeline.py:437`) using Spark's own JSON encoders for byte-compatible
  * lines. Side-effect ordering preserved from the reference: raw artifacts
  * → read state → write normalized+state (unconditionally, *before* the
  * decision) → report/summary → notify.
  */
object RunPipeline {

  case class Config(
      requestedSources: Seq[String] = Seq("pozos"),
      timeout: Int = 30,
      retries: Int = 3,
      failFast: Boolean = false,
      mismatchThreshold: Double = 0.25,
      forcePublish: Boolean = false,
      workDir: String,
      runId: String = java.util.UUID.randomUUID().toString,
      now: () => String = () => java.time.Instant.now().toString)

  case class Result(summary: Summary, report: Report, record: NormalizedRecord,
      collected: Seq[SourcePayload])

  /** Validate + dedupe the requested source list (reference
    * `pipeline.py:34-46`): `all`/`pozos` collapse to pozos; unknown → error. */
  def normalizeSources(requested: Seq[String], known: Set[String]): Seq[String] = {
    val mapped = requested.map(_.trim.toLowerCase).map {
      case "all" => "pozos"
      case s => s
    }
    mapped.foreach { s =>
      if (s != "pozos" && !known.contains(s))
        throw new graft.ConfigError(s"Unknown source: $s", Map("source" -> s))
    }
    mapped.distinct
  }

  def run(spark: SparkSession, sources: Seq[PozoSource], cfg: Config,
      log: Observability.LogStream = new Observability.BufferingLogStream): Result = {
    import spark.implicits._
    Observability.setCorrelationId(spark, cfg.runId)
    log.emit(Observability.Event("pipeline_start", cfg.now(), cfg.runId,
      Map("sources" -> cfg.requestedSources.mkString(","))))

    // 1. Collect payloads; per-source failure = warn + continue unless
    //    fail-fast (reference `pipeline.py:102-132`).
    val collected = Observability.span(spark, log, "ingestion_orchestration",
        now = cfg.now) {
      sources.sortBy(_.priority).flatMap { src =>
        try Some(src.fetch())
        catch {
          case e: Exception if !cfg.failFast =>
            System.err.println(s"[pipeline] source ${src.name} failed: ${e.getMessage}")
            log.emit(Observability.Event("source_failed", cfg.now(), cfg.runId,
              Map("source" -> src.name, "error" -> String.valueOf(e.getMessage))))
            None
        }
      }
    }
    Observability.metric(spark, log, "sources_collected", collected.size, now = cfg.now)
    if (collected.isEmpty)
      throw new RuntimeException(
        s"No sources returned data for ${cfg.requestedSources.mkString(",")}")

    val payloads = spark.createDataset(collected).toDF()

    // 2-3. Consensus merge + scalars (distributed; SURVEY §2.4).
    val mergeRows = Observability.span(spark, log, "consensus_merge", now = cfg.now) {
      Consensus.merge(payloads).orderBy("categoria").collect()
    }
    val resolved = mergeRows.map(r =>
      r.getAs[String]("categoria") -> r.getAs[Long]("valor")).toMap

    val mismatches = mergeRows.toSeq.flatMap { r =>
      val disagreeing = Option(r.getAs[Map[String, scala.collection.Seq[String]]]("disagreeing"))
        .getOrElse(Map.empty).map { case (k, v) => k -> v.toSeq }
      val missing = r.getAs[scala.collection.Seq[String]]("missing_sources").toSeq
      if (disagreeing.nonEmpty || missing.nonEmpty)
        Some(Mismatch(
          categoria = r.getAs[String]("categoria"),
          consensus = Map(r.getAs[Long]("valor").toString ->
            r.getAs[scala.collection.Seq[String]]("winner_sources").toSeq),
          disagreeing = disagreeing,
          max_deviation = if (disagreeing.nonEmpty)
            Some(r.getAs[Double]("max_deviation")) else None,
          missing_sources = missing))
      else None
    }

    val mismatchRatio =
      if (resolved.isEmpty) 0.0
      else mismatches.count(_.disagreeing.nonEmpty).toDouble / resolved.size
    val maxDeviation =
      (0.0 +: mismatches.flatMap(_.max_deviation)).max

    // Confidence scoring (reference `pipeline.py:391-404`).
    val expected = cfg.requestedSources.map {
      case "pozos" => sources.size
      case _ => 1
    }.sum
    val confidence =
      if (collected.size < expected || mismatchRatio > 0) "degraded"
      else if (collected.size == 1) "single_source"
      else "full"

    // 4. Record build (reference `pipeline.py:406-417`): primary = first
    //    collected (lowest priority).
    val primary = collected.head
    val prov = Provenance(PozosProvenance(
      SourceDesc.of(collected.head), collected.tail.map(SourceDesc.of)))
    val record = NormalizedRecord(
      sorteo = primary.sorteo, fecha = primary.fecha,
      fuente = Some(primary.fuente), confidence = confidence,
      premios = Seq.empty, pozos_proximo = resolved, provenance = prov)

    // 5. Raw per-source artifacts (reference `pipeline.py:419-429`):
    //    single-source keeps the requested name; multi-source uses munged
    //    netloc.
    val rawDir = Paths.get(cfg.workDir, "raw")
    Files.createDirectories(rawDir)
    collected.foreach { p =>
      val fname =
        if (cfg.requestedSources.size == 1 && sources.size == 1)
          cfg.requestedSources.head
        else Option(new java.net.URI(p.fuente).getHost)
          .map(_.replace(".", "_")).getOrElse("source")
      writeAtomic(rawDir.resolve(s"$fname.json"),
        spark.createDataset(Seq(p)).toJSON.head() + "\n")
    }

    // 6. Previous state: PERMISSIVE JSONL scan tolerating corrupt lines
    //    (reference `pipeline.py:66-79`).
    val statePath = Paths.get(cfg.workDir, "state", "last_run.jsonl")
    val previous = loadState(spark, statePath.toString)

    // 7. Change detection (reference `pipeline.py:257-285`).
    val currentDf = spark.createDataset(Seq(record)).toDF()
      .select(col("sorteo"), col("fecha"),
        col("provenance.pozos.primary.sha256").as("sha256"), col("pozos_proximo"))
    val unchanged = previous.exists { prev =>
      prev.sorteo == record.sorteo && prev.fecha == record.fecha && {
        val shaEq = (for {
          a <- prev.provenance.pozos.primary.sha256
          b <- record.provenance.pozos.primary.sha256
        } yield a == b).getOrElse(false)
        shaEq || prev.pozos_proximo == record.pozos_proximo
      }
    }

    // 8. Normalized + state written unconditionally, BEFORE the decision
    //    (reference `pipeline.py:436-437`).
    val recordJson = spark.createDataset(Seq(record)).toJSON.head() + "\n"
    writeAtomic(Paths.get(cfg.workDir, "normalized.jsonl"), recordJson)
    writeAtomic(statePath, recordJson)

    // 9. Decision (reference `pipeline.py:439-459`).
    val (status, publishFlag, reason) = StatePipeline.decide(
      unchanged, mismatchRatio, maxDeviation, cfg.mismatchThreshold, cfg.forcePublish)

    val generatedAt = cfg.now()
    val decision = Decision(status, confidence, resolved.size.toLong,
      mismatches.count(_.disagreeing.nonEmpty).toLong, reason)
    val report = Report(
      RunInfo(cfg.runId, generatedAt, cfg.requestedSources, cfg.timeout,
        cfg.retries, cfg.failFast),
      LastDraw(record.sorteo, record.fecha), decision, mismatches, ApiVersion)
    val summary = Summary(cfg.runId, generatedAt, decision,
      prizes_changed = !unchanged, publish = publishFlag,
      publish_reason = reason, api_version = ApiVersion)

    // 10. Report + summary sinks.
    writeAtomic(Paths.get(cfg.workDir, "comparison_report.json"),
      spark.createDataset(Seq(report)).toJSON.head() + "\n")
    writeAtomic(Paths.get(cfg.workDir, "run_summary.json"),
      spark.createDataset(Seq(summary)).toJSON.head() + "\n")

    log.emit(Observability.Event("pipeline_end", cfg.now(), cfg.runId,
      Map("decision" -> status, "publish" -> publishFlag.toString,
        "confidence" -> confidence)))
    Observability.metric(spark, log, "mismatched_categories",
      mismatches.count(_.disagreeing.nonEmpty), now = cfg.now)
    Result(summary, report, record, collected)
  }

  /** PERMISSIVE JSONL state scan; corrupt/blank lines skipped
    * (reference `pipeline.py:66-79`). */
  def loadState(spark: SparkSession, path: String): Seq[NormalizedRecord] = {
    if (!Files.exists(Paths.get(path))) return Seq.empty
    import spark.implicits._
    val schema = Encoders.product[NormalizedRecord].schema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
      .as[NormalizedRecord]
      .collect().toSeq
  }

  private def writeAtomic(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
