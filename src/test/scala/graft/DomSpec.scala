package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Dom, DomPozoSource, Fetcher, FixtureTransport}

/** DOM parser + polla.cl selector-extraction semantics (reference
  * `sources/pozos.py:363-438`, `tests/test_pozo_polla.py:9-105`). */
class DomSpec extends AnyFunSuite {

  test("parser: nesting, void tags, entities, raw script, auto-close li") {
    val root = Dom.parse(
      """<ul><li>uno<li>dos &amp; tres</ul>
        |<script>if (a < b) { x(); }</script>
        |<p>caf&eacute; <img src="x.png"> tail</p>""".stripMargin)
    val lis = root.descendantElems.filter(_.tag == "li").toSeq
    assert(lis.map(_.textStripped) == Seq("uno", "dos & tres"))
    // the second li is a SIBLING (auto-closed), not a child of the first
    assert(lis(1).parentElem.get.tag == "ul")
    val script = root.firstByTag("script").get
    assert(script.textStripped.contains("a < b"))
    // void img doesn't swallow the trailing text
    val p = root.firstByTag("p").get
    assert(p.strippedStrings == Seq("café", "tail"))
    assert(p.firstByTag("img").get.attr("src").contains("x.png"))
  }

  test("reference-test parity: total + loto logo + sorteo/fecha") {
    // the exact rendered-HTML shape of tests/test_pozo_polla.py:14-27
    val html = """
      <li>
          <span>POZO TOTAL ESTIMADO A REPARTIR ENTRE TODAS LAS CATEGORÍAS</span>
          <span class="prize">$2.300</span>
          <span>MILLONES</span>
      </li>
      <li class="sub-game">
          <span class="img-wrap"><img src="/static/assets/new_loto_logo.png"/></span>
          <span class="prize">$140</span>
          <span>MILLONES</span>
      </li>
      Fecha Próximo Sorteo: 26 de abril de 2026 Sorteo N° 5417
    """
    val url = "https://www.polla.cl/es/"
    val src = new DomPozoSource("polla", 1, url, "TestBot/1.0",
      new Fetcher(new FixtureTransport(Map(url -> html))))
    val p = src.fetch()
    assert(p.montos == Map("Total estimado" -> 2300000000L, "Loto Clásico" -> 140000000L))
    assert(p.sorteo.contains(5417L) && p.fecha.contains("2026-04-26"))
    assert(p.estimado)
  }

  test("full logo map incl. jubilazo $-amount disambiguation") {
    def sub(src: String, extra: String = "") =
      s"""<li class="sub-game"><img src="$src"/>$extra<span class="prize">$$10</span><span>MILLONES</span></li>"""
    val html = Seq(
      sub("/a/new_loto_logo.png"),
      sub("/a/loto_recargado.png"),
      sub("/a/loto_revancha.png"),
      sub("/a/loto_desquite.png"),
      sub("/a/jubilazo.png", "<span>$1.000.000</span>"),
      sub("/a/jubilazo.png", "<span>$500.000</span>"),
      sub("/a/jubilazo-50.png", "<span>$1.000.000</span>"),
      sub("/a/jubilazo-50.png", "<span>$500.000</span>")).mkString("\n")
    val got = DomPozoSource.extractAmounts(Dom.parse(html))
    assert(got.keySet == Set("Loto Clásico", "Recargado", "Revancha", "Desquite",
      "Jubilazo $1.000.000", "Jubilazo $500.000",
      "Jubilazo 50 años $1.000.000", "Jubilazo 50 años $500.000"))
    assert(got.values.forall(_ == 10000000L))
  }

  test("skip rules: no img, bad prize, unmapped logo, jubilazo w/o amount") {
    val html = """
      <li class="sub-game"><span class="prize">$10</span></li>
      <li class="sub-game"><img src="/a/new_loto_logo.png"/><span class="prize">n/a</span></li>
      <li class="sub-game"><img src="/a/kino.png"/><span class="prize">$10</span></li>
      <li class="sub-game"><img src="/a/jubilazo.png"/><span class="prize">$10</span></li>
      <li class="sub-game"><img src="/a/loto_revancha.png"/><span class="prize">$25</span></li>
    """
    assert(DomPozoSource.extractAmounts(Dom.parse(html)) == Map("Revancha" -> 25000000L))
  }

  test("total requires a strict li ancestor of the text's owner") {
    // text directly inside the li: owner IS the li, find_parent('li')
    // looks above it and finds nothing (BeautifulSoup semantics)
    val bare = """<li>POZO TOTAL ESTIMADO<span class="prize">$2.300</span></li>"""
    assert(DomPozoSource.extractAmounts(Dom.parse(bare)).isEmpty)
    val nested = """<li><span>POZO TOTAL ESTIMADO</span><span class="prize">$2.300</span></li>"""
    assert(DomPozoSource.extractAmounts(Dom.parse(nested)) ==
      Map("Total estimado" -> 2300000000L))
  }

  test("zero-amount guard raises ParseError") {
    val url = "https://www.polla.cl/es/"
    val src = new DomPozoSource("polla", 1, url, "TestBot/1.0",
      new Fetcher(new FixtureTransport(Map(url -> "<div>nada</div>"))))
    val e = intercept[ParseError](src.fetch())
    assert(e.getMessage.contains("No valid pozo amounts"))
  }
}
