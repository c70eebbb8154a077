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
