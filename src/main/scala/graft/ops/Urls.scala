package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup-by-canonical-URL — the first dedup pass
  * every crawl pipeline runs (cheaper than any content hash: two fetches
  * of `HTTPS://Example.COM:443/a/?utm_source=x` and `https://example.com/a`
  * are the same page before a byte of body is compared).
  *
  * Canonical form: lowercase scheme+host, default port stripped
  * (`:443` for https, `:80` for http), fragment dropped, `utm_*`
  * tracking params dropped, remaining query params sorted, trailing
  * path slashes trimmed. Everything is per-row string/regexp/array
  * expressions — map-only, whole-stage codegen, and transliterable to
  * any engine (the oracle replays it in DuckDB SQL verbatim).
  *
  * Scale: canonicalization adds no shuffle; [[dedupByUrl]] is one
  * partial-aggregated shuffle keyed by canonical URL — identical shape
  * to exact content dedup, O(distinct URLs) through the wire.
  */
object Urls {

  /** Canonical form of a URL column (see object doc for the rules). */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([^:]+)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[^:]+://([^/?#]+)", 1))
    val host = when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
        .otherwise(hostRaw))
    val path = regexp_replace(
      regexp_extract(noFrag, "^[^:]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    // drop tracking params, sort the rest for order-insensitivity
    // (substring test, not LIKE/startswith — portable to every engine)
    val params = array_sort(filter(split(query, "&"),
      p => (p =!= "") && (substring(p, 1, 4) =!= "utm_")))
    val qs = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, path, qs)
  }

  /** Group rows by canonical URL: one row per distinct canonical form
    * with the lowest id as keeper, the duplicate count, and how many
    * distinct RAW spellings collapsed into it. */
  def dedupByUrl(df: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"),
        countDistinct(col(urlCol)).as("n_raw_forms"))
}
