package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.GraftError

/** Observability operators (reference `polla_app/obs.py`, SURVEY §2.11):
  * structured JSONL-style events with correlation id, spans with
  * durations, counters, and redaction — mapped to Spark's listener and
  * local-property machinery plus a *plan-time* sanitize projection
  * (schema-driven, not a runtime reflection walk).
  */
object Observability {

  case class Event(event: String, timestamp: String, correlationId: String,
      attrs: Map[String, String])

  /** Pluggable structured-log sink (the reference's `LogStream` protocol,
    * `pipeline.py:26-31`). */
  trait LogStream {
    def emit(e: Event): Unit
    def close(): Unit = ()
  }

  final class BufferingLogStream extends LogStream {
    val events = scala.collection.mutable.ListBuffer[Event]()
    def emit(e: Event): Unit = events.synchronized { events += e }
  }

  /** Append-only JSONL file sink (reference `_JSONLogStream`,
    * `pipeline.py:228-254`). */
  final class JsonlLogStream(path: java.nio.file.Path) extends LogStream {
    java.nio.file.Files.createDirectories(path.getParent)
    private val w = java.nio.file.Files.newBufferedWriter(path,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    private def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def emit(e: Event): Unit = synchronized {
      val attrs = e.attrs.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
      w.write(s"""{"event": ${q(e.event)}, "timestamp": ${q(e.timestamp)}, """ +
        s""""correlation_id": ${q(e.correlationId)}, "attrs": $attrs}\n""")
      w.flush()
    }
    override def close(): Unit = w.close()
  }

  private val CorrelationKey = "graft.run_id"

  /** Set the correlation id on the Spark context (reference `ContextVar`,
    * `obs.py:20-28` → `setLocalProperty`, visible to listeners + tasks). */
  def setCorrelationId(spark: SparkSession, runId: String): Unit =
    spark.sparkContext.setLocalProperty(CorrelationKey, runId)

  def correlationId(spark: SparkSession): String =
    Option(spark.sparkContext.getLocalProperty(CorrelationKey)).getOrElse("n/a")

  /** span(name) { ... } → span_start/span_end events with duration_ms
    * (reference `obs.py:67-91`). */
  def span[T](spark: SparkSession, log: LogStream, name: String,
      attrs: Map[String, String] = Map.empty,
      now: () => String = () => java.time.Instant.now().toString)(body: => T): T = {
    val cid = correlationId(spark)
    log.emit(Event("span_start", now(), cid, attrs + ("span" -> name)))
    val t0 = System.nanoTime()
    try {
      val r = body
      log.emit(Event("span_end", now(), cid, attrs +
        ("span" -> name, "status" -> "ok",
          "duration_ms" -> ((System.nanoTime() - t0) / 1e6).round.toString)))
      r
    } catch {
      case e: Throwable =>
        val ctx = e match {
          case g: GraftError => g.sanitizedContext + ("error_code" -> g.errorCode)
          case _ => Map("error" -> String.valueOf(e.getMessage))
        }
        log.emit(Event("span_end", now(), cid, attrs ++ ctx +
          ("span" -> name, "status" -> "error",
            "duration_ms" -> ((System.nanoTime() - t0) / 1e6).round.toString)))
        throw e
    }
  }

  /** Counter event (reference `metric(...)`, `obs.py:94-107`). */
  def metric(spark: SparkSession, log: LogStream, name: String, value: Long,
      kind: String = "counter", tags: Map[String, String] = Map.empty,
      now: () => String = () => java.time.Instant.now().toString): Unit =
    log.emit(Event("metric", now(), correlationId(spark),
      tags + ("name" -> name, "kind" -> kind, "value" -> value.toString)))

  /** Listener that turns every completed action into a structured event
    * with wall-clock duration — the engine-level span stream. */
  final class ActionListener(log: LogStream) extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      log.emit(Event("query_end", java.time.Instant.now().toString,
        Option(qe.sparkSession.sparkContext.getLocalProperty(CorrelationKey))
          .getOrElse("n/a"),
        Map("action" -> funcName, "status" -> "ok",
          "duration_ms" -> (durationNs / 1e6).round.toString)))
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      log.emit(Event("query_end", java.time.Instant.now().toString,
        Option(qe.sparkSession.sparkContext.getLocalProperty(CorrelationKey))
          .getOrElse("n/a"),
        Map("action" -> funcName, "status" -> "error",
          "error" -> String.valueOf(e.getMessage))))
  }

  /** Redaction expression (reference `exceptions.py:78-93`). */
  def redactCol(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .when(length(c) <= 6, lit("…"))
      .otherwise(concat(substring(c, 1, 4), lit("…"), substring(c, -2, 2)))

  /** Schema-driven sanitize: rebuild the projection redacting every
    * STRING field whose name matches the sensitive predicate, recursing
    * through structs (reference's runtime dict walk `obs.py:44-64`, done
    * once at plan time — zero per-row reflection). */
  def sanitize(df: DataFrame): DataFrame = {
    def rebuild(c: Column, dt: DataType, name: String): Column = dt match {
      case StringType if GraftError.sensitive(name) => redactCol(c)
      case s: StructType =>
        when(c.isNull, lit(null).cast(s)).otherwise(
          struct(s.fields.toSeq.map(f =>
            rebuild(c.getField(f.name), f.dataType, f.name).as(f.name)): _*))
      case _ => c
    }
    df.select(df.schema.fields.toSeq.map(f =>
      rebuild(col(f.name), f.dataType, f.name).as(f.name)): _*)
  }
}
