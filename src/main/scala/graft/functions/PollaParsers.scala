package graft.functions

import java.time.LocalDate
import scala.util.matching.Regex

/** Spanish-money / Spanish-date / jackpot-page parsers.
  *
  * Semantics reproduced from the reference implementation (behavior only,
  * re-expressed in Scala):
  *  - monetary parser: reference `polla_app/sources/pozos.py:60-145`
  *    (golden table `tests/test_monetary_parser.py:7-55`)
  *  - date parser: `polla_app/sources/pozos.py:161-203`
  *  - amount extraction: `polla_app/sources/pozos.py:20-57,148-158`
  *  - sorteo/fecha extraction: `polla_app/sources/pozos.py:206-224`
  *  - redaction: `polla_app/exceptions.py:78-93`
  *
  * Exposed two ways: pure Scala (for unit tests / driver-side use) and as
  * registered Spark UDFs (`PollaFunctions.register`) for SQL/DataFrame use.
  * Errors surface as `Left(reason)` / SQL NULL rather than exceptions so a
  * bad row can't kill a 100 TB job; callers that need the reference's
  * fail-the-run semantics filter on the error column.
  */
object PollaParsers {

  /** Parse Spanish-formatted "millones" money into integer CLP.
    * "690" → 690000000; "4.300" → 4300000000; "4,75" → 4750000;
    * "1.234,56" → 1234560000; "4.300 MM" → 4300000000; "1.000.000 Mil" → 1000000000.
    */
  def parseClp(raw: String): Either[String, Long] = {
    val s0 = Option(raw).getOrElse("").trim.toLowerCase
    if (s0.isEmpty) return Left("empty monetary value")

    var multiplier = 1000000L
    var c = s0
    if (c.endsWith("mm") || c.contains("millones")) {
      multiplier = 1000000L
      c = c.replace("millones", "").replace("mm", "").trim
    } else if (c.endsWith("mil")) {
      multiplier = 1000L
      c = c.replace("mil", "").trim
    } else if (c.endsWith("m")) {
      multiplier = 1000000L
      c = c.reverse.dropWhile(_ == 'm').reverse.trim
    }
    c = c.replace("$", "").replace(" ", "")

    val hasDot = c.contains('.')
    val hasComma = c.contains(',')
    if (hasDot && hasComma) {
      // Mixed "1.234,56": dots must be 3-digit thousands groups.
      val parts = c.split("\\.", -1)
      if (parts.drop(1).dropRight(1).exists(_.length != 3))
        return Left(s"invalid thousands separator position: $raw")
      if (parts.last.split(",", -1)(0).length != 3)
        return Left(s"invalid last thousands separator: $raw")
      c = c.replace(".", "").replace(",", ".")
    } else if (hasComma) {
      val parts = c.split(",", -1)
      if (parts.length > 2) {
        if (parts.drop(1).exists(_.length != 3)) return Left(s"invalid multiple commas: $raw")
        c = c.replace(",", "")
      } else if (parts.length == 2 && parts(1).length == 3) {
        c = c.replace(",", "") // "4,300" → 4300
      } else {
        c = c.replace(",", ".") // "4,75" → 4.75
      }
    } else if (hasDot) {
      val parts = c.split("\\.", -1)
      if (parts.length > 2) {
        if (parts.drop(1).exists(_.length != 3)) return Left(s"invalid multiple dots: $raw")
        c = c.replace(".", "")
      } else if (parts.length == 2 && parts(1).length == 3) {
        c = c.replace(".", "") // "4.300" → 4300
      } // else "4.3" stays a decimal
    }

    try {
      val v = c.toDouble
      Right(Math.round(v * multiplier))
    } catch {
      case _: NumberFormatException => Left(s"unable to parse monetary value: $raw")
    }
  }

  private val months: Map[String, Int] = Map(
    "enero" -> 1, "febrero" -> 2, "marzo" -> 3, "abril" -> 4, "mayo" -> 5,
    "junio" -> 6, "julio" -> 7, "agosto" -> 8, "septiembre" -> 9,
    "setiembre" -> 9, "octubre" -> 10, "noviembre" -> 11, "diciembre" -> 12)

  private val dateRe: Regex =
    "(?i)(\\d{1,2})\\s+de\\s+([a-zA-Z\\u00C0-\\u017F]+)\\s+(?:de|del)\\s+(\\d{4})".r
  private val dateAltRe: Regex =
    "(?i)([a-zA-Z\\u00C0-\\u017F]+)\\s+(\\d{1,2}),\\s+(\\d{4})".r
  private val proxFechaBlockRe: Regex =
    "(?i)(?:Fecha|Pr[o\\u00F3]ximo\\s+Sorteo)[:\\s]*([^\\n]+)".r
  private val sorteoRe: Regex =
    "(?i)Sorteo\\s*(?:N[\\u00B0\\u00BA]|#|:|n[\\u00FAu]mero|nro)?\\s*(\\d{4,})".r

  private def mkDate(y: String, m: Int, d: String): Option[String] =
    try Some(LocalDate.of(y.toInt, m, d.toInt).toString)
    catch { case _: Exception => None }

  /** "16 de septiembre de 2025" / "abril 27, 2026" → ISO date. */
  def parseSpanishDate(text: String): Option[String] = {
    if (text == null) return None
    val primary = dateRe.findFirstMatchIn(text).flatMap { m =>
      months.get(m.group(2).toLowerCase).flatMap(mo => mkDate(m.group(3), mo, m.group(1)))
    }
    primary.orElse {
      dateAltRe.findFirstMatchIn(text).flatMap { m =>
        months.get(m.group(1).toLowerCase).flatMap(mo => mkDate(m.group(3), mo, m.group(2)))
      }
    }
  }

  /** Prize-category label patterns (reference `sources/pozos.py:20-44`),
    * in registration order — the order is semantic for provenance/tie-break. */
  val labelPatterns: Seq[(String, String)] = Seq(
    "Loto Clásico" -> "Loto\\s+Cl[aá]sico",
    "Recargado" -> "Recargado",
    "Revancha" -> "Revancha",
    "Desquite" -> "Desquite",
    "Jubilazo $1.000.000" ->
      "Jubilazo(?:\\s*(?:de\\s*)?\\$?1\\.000\\.000)?(?!\\s*(?:50\\s*a(?:ñ|n)os|Aniversario))",
    "Jubilazo $500.000" -> "Jubilazo\\s*(?:de\\s*)?\\$?500\\.000",
    "Jubilazo 50 años $1.000.000" ->
      "Jubilazo\\s*(?:50\\s*a(?:ñ|n)os|Aniversario)(?:\\s*de)?\\s*\\$?1\\.000\\.000",
    "Jubilazo 50 años $500.000" ->
      "Jubilazo\\s*(?:50\\s*a(?:ñ|n)os|Aniversario)(?:\\s*de)?\\s*\\$?500\\.000",
    "Total estimado" -> "Total\\s+estimado")

  private val labelRegex: Seq[(String, Regex)] = labelPatterns.map { case (label, p) =>
    label -> ("(?i)" + p + "[^0-9$]{0,50}\\$?([\\d\\.,]+)").r
  }

  /** Extract category → CLP amounts from page text.
    *
    * `absentAsZero=true` mirrors the text-scrape sources (`_fetch_pozos`,
    * reference `sources/pozos.py:148-158`): absent label → 0, except
    * "Total estimado" which only appears when found and allowed.
    * `absentAsZero=false` mirrors the DOM source (`get_pozo_polla`,
    * `sources/pozos.py:272-438`): only categories actually present. */
  def extractAmounts(text: String, allowTotal: Boolean = true,
      absentAsZero: Boolean = true): Either[String, Map[String, Long]] = {
    if (text == null) return Left("null text")
    val out = scala.collection.mutable.LinkedHashMap[String, Long]()
    for ((label, re) <- labelRegex) {
      if (!(label == "Total estimado" && !allowTotal)) {
        re.findFirstMatchIn(text) match {
          case Some(m) =>
            parseClp(m.group(1)) match {
              case Right(v) => out(label) = v
              case Left(e)  => return Left(e)
            }
          case None =>
            if (label != "Total estimado" && absentAsZero) out(label) = 0L
        }
      }
    }
    Right(out.toMap)
  }

  /** Extract (sorteo number, ISO fecha) from page text; "Fecha/Próximo
    * Sorteo:" block date preferred over whole-text date. */
  def extractProximoInfo(text: String): (Option[Long], Option[String]) = {
    if (text == null) return (None, None)
    val sorteo = sorteoRe.findFirstMatchIn(text).flatMap(m =>
      try Some(m.group(1).toLong) catch { case _: Exception => None })
    val blockDate = proxFechaBlockRe.findFirstMatchIn(text)
      .flatMap(m => parseSpanishDate(m.group(1)))
    (sorteo, blockDate.orElse(parseSpanishDate(text)))
  }

  /** Mask a secret: ≤6 chars → "…", else first4 + "…" + last2. */
  def redact(token: String): String = {
    if (token == null) null
    else if (token.length <= 6) "…"
    else token.take(4) + "…" + token.takeRight(2)
  }
}

/** Spark UDF registration for the parser surface. */
object PollaFunctions {
  import org.apache.spark.sql.SparkSession

  /** Idempotent per session: Queries re-registers per invocation, and each
    * re-register emits a SimpleFunctionRegistry WARN per function — seven of
    * which half-filled the bench tail's 2 kB stdout window in BENCH_r14. */
  def register(spark: SparkSession): Unit = {
    if (spark.catalog.functionExists("parse_clp")) return
    spark.udf.register("parse_clp",
      (s: String) => PollaParsers.parseClp(s).toOption.map(Long.box).orNull)
    spark.udf.register("parse_clp_err",
      (s: String) => PollaParsers.parseClp(s).left.toOption.orNull)
    spark.udf.register("parse_spanish_date",
      (s: String) => PollaParsers.parseSpanishDate(s).orNull)
    spark.udf.register("extract_amounts",
      (s: String, allowTotal: Boolean) =>
        PollaParsers.extractAmounts(s, allowTotal).toOption.orNull)
    spark.udf.register("extract_sorteo",
      (s: String) => PollaParsers.extractProximoInfo(s)._1.map(Long.box).orNull)
    spark.udf.register("extract_fecha",
      (s: String) => PollaParsers.extractProximoInfo(s)._2.orNull)
    spark.udf.register("redact", (s: String) => PollaParsers.redact(s))
  }
}
