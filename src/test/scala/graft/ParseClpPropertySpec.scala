package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.PollaParsers.parseClp

/** Property tests for the monetary parser — an upgrade the reference's
  * suite lacks (SURVEY §5): round-trips through Chilean formatting. */
class ParseClpPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def groupThousands(n: Long): String =
    n.toString.reverse.grouped(3).mkString(".").reverse

  test("plain integers parse as millones") {
    check(Prop.forAll(Gen.chooseNum(1L, 999999L)) { n =>
      parseClp(n.toString) == Right(n * 1000000L)
    })
  }

  test("thousands-dotted integers round-trip") {
    check(Prop.forAll(Gen.chooseNum(1000L, 99999999L)) { n =>
      parseClp(groupThousands(n)) == Right(n * 1000000L)
    })
  }

  test("currency symbol, spaces, and MM suffix never change the value") {
    check(Prop.forAll(Gen.chooseNum(1L, 999999L)) { n =>
      val base = parseClp(n.toString)
      parseClp(s"$$ $n") == base &&
        parseClp(s"  $n  ") == base &&
        parseClp(s"$n MM") == base
    })
  }

  test("comma decimals scale linearly (two decimal places)") {
    check(Prop.forAll(Gen.chooseNum(0L, 999L), Gen.chooseNum(0, 99)) { (int, frac) =>
      parseClp(f"$int%d,$frac%02d") == Right(int * 1000000L + frac * 10000L)
    })
  }

  test("mil suffix scales by thousands, not millions") {
    check(Prop.forAll(Gen.chooseNum(1L, 999999L)) { n =>
      parseClp(s"$n Mil") == Right(n * 1000L)
    })
  }

  test("digit-free garbage never parses") {
    check(Prop.forAll(Gen.alphaStr.suchThat(s => s.nonEmpty && !s.exists(_.isDigit))) {
      s => parseClp(s).isLeft
    })
  }
}
