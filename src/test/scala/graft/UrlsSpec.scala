package graft

import org.apache.spark.sql.functions._
import graft.ops.Urls

/** URL canonicalization rules, edge cases first. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("case, default port, fragment, utm params, param order, slash") {
    assert(canon(
      "HTTPS://WWW.Site.COM:443/a/?b=2&a=1&utm_source=x#frag",
      "https://www.site.com/a?a=1&b=2",
      "http://Host.io:80/x",
      "http://host.io:8080/x", // non-default port KEPT
      "https://host.io:80/x"   // :80 is only default for http — kept
    ) == Seq(
      "https://www.site.com/a?a=1&b=2",
      "https://www.site.com/a?a=1&b=2",
      "http://host.io/x",
      "http://host.io:8080/x",
      "https://host.io:80/x"))
  }

  test("utm-only query drops the '?'; empty path and root slash stable") {
    assert(canon(
      "https://a.b/p?utm_campaign=c&utm_medium=m",
      "https://a.b",
      "https://a.b/",
      "https://a.b///"
    ) == Seq("https://a.b/p", "https://a.b", "https://a.b", "https://a.b"))
  }

  test("canonicalization is idempotent (a canonical URL maps to itself)") {
    val rnd = new scala.util.Random(7)
    val hosts = Seq("A.b.C", "x.io:443", "x.io:8080", "X.IO")
    val paths = Seq("", "/", "/p", "/p/", "/p//q///")
    val queries = Seq("", "?a=1", "?b=2&a=1", "?utm_source=x", "?utm_a=1&z=9&a=2")
    val frags = Seq("", "#f", "#a?b=1")
    val urls = (0 until 200).map { _ =>
      val scheme = if (rnd.nextBoolean()) "https" else "HTTP"
      scheme + "://" + hosts(rnd.nextInt(hosts.length)) +
        paths(rnd.nextInt(paths.length)) + queries(rnd.nextInt(queries.length)) +
        frags(rnd.nextInt(frags.length))
    }
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    assert(once == twice, once.zip(twice).filter(p => p._1 != p._2).take(3).toString)
  }

  test("dedup groups variants and counts raw spellings") {
    val df = Seq(
      (1L, "https://s.io/p?x=1"),
      (2L, "HTTPS://S.IO:443/p/?x=1"),
      (3L, "https://s.io/p?x=1#top"),
      (4L, "https://s.io/q")).toDF("doc_id", "url")
    val got = Urls.dedupByUrl(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("https://s.io/p?x=1") == ((1L, 3L, 3L)))
    assert(got("https://s.io/q") == ((4L, 1L, 1L)))
  }
}
