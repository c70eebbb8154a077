package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PollaParsers._

/** Golden tables from the reference (`tests/test_monetary_parser.py:7-55`,
  * `tests/test_parsers.py`, `tests/test_pozo_polla.py:15-27`). */
class PollaParsersSpec extends AnyFunSuite {

  val valid: Seq[(String, Long)] = Seq(
    "690" -> 690000000L,
    "$ 690" -> 690000000L,
    "4.300" -> 4300000000L,
    "4,75" -> 4750000L,
    "1.234,56" -> 1234560000L,
    "4300" -> 4300000000L,
    "$ 4.300" -> 4300000000L,
    "0,5" -> 500000L,
    "4.300 MM" -> 4300000000L,
    "4,3 M" -> 4300000L,
    "1.000.000 Mil" -> 1000000000L,
    "7500" -> 7500000000L,
    "99.999" -> 99999000000L,
    "0,1" -> 100000L,
    "1.234.567" -> 1234567000000L)

  test("parse_clp golden valid table") {
    for ((raw, want) <- valid)
      assert(parseClp(raw) == Right(want), s"raw=$raw")
  }

  test("parse_clp golden invalid table") {
    for (raw <- Seq("", " ", "$", "abc", "1.2.3.4"))
      assert(parseClp(raw).isLeft, s"raw=$raw")
  }

  test("parse_spanish_date shapes") {
    assert(parseSpanishDate("16 de septiembre de 2025").contains("2025-09-16"))
    assert(parseSpanishDate("1 de setiembre del 2024").contains("2024-09-01"))
    assert(parseSpanishDate("abril 27, 2026").contains("2026-04-27"))
    assert(parseSpanishDate("sin fecha").isEmpty)
    assert(parseSpanishDate("99 de enero de 2025").isEmpty) // invalid day
  }

  test("extract_proximo_info prefers the Fecha block and finds sorteo") {
    val text = "Sorteo N° 5417 Fecha Próximo Sorteo: 26 de abril de 2026 " +
      "pero antes 1 de enero de 2020"
    val (sorteo, fecha) = extractProximoInfo(text)
    assert(sorteo.contains(5417L))
    assert(fecha.contains("2026-04-26"))
  }

  test("extract_amounts: absent label → 0, Total excluded when not allowed") {
    val text = "Loto Clásico estimado: $690 MILLONES Recargado: $180 MILLONES " +
      "Revancha $100 millones Desquite: $510 millones " +
      "Jubilazo $1.000.000 960 millones Total estimado: $4.300 MILLONES"
    val Right(without) = extractAmounts(text, allowTotal = false)
    assert(!without.contains("Total estimado"))
    assert(without("Loto Clásico") == 690000000L)
    assert(without("Recargado") == 180000000L)
    assert(without("Revancha") == 100000000L)
    assert(without("Desquite") == 510000000L)
    assert(without("Jubilazo $1.000.000") == 960000000L)
    // absent-label ⇒ 0 rule
    assert(without("Jubilazo $500.000") == 0L)
    assert(without("Jubilazo 50 años $1.000.000") == 0L)
    val Right(withTotal) = extractAmounts(text, allowTotal = true)
    assert(withTotal("Total estimado") == 4300000000L)
  }

  test("redact masks by length") {
    assert(redact("short") == "…")
    assert(redact("secret-token-value") == "secr…ue")
  }
}
