package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup key derivation a web-crawl corpus
  * runs before exact dedup (the same fetched page arrives under
  * `HTTP://WWW.Site.com:80/a/?utm_source=x&b=1#frag` and
  * `https://site.com/a?b=1`): scheme and default ports dropped, host
  * lowercased and de-www'd, fragment stripped, tracking parameters
  * (utm_*, fbclid, gclid, ref) removed, surviving query parameters
  * sorted so order never splits a key, trailing slashes folded.
  *
  * All map-only column expressions over Spark's codegen'd regexp/array
  * builtins — at 100 TB the canonical key is computed at scan speed and
  * feeds the standard exact-dedup shuffle ([[graft.dedup.TextDedup]]);
  * the host-first key shape also makes it the natural Z-order /
  * partition column for crawl layouts. Character classes avoid
  * `\s`-style shorthands so Java regex and RE2 agree.
  */
object Urls {

  private val TrackingParams = Seq("fbclid", "gclid", "ref")

  /** Canonical form of a URL column (see object doc for the rules).
    * Output has no scheme: `host/path?sorted=params`. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val rawQuery = when(noScheme.contains("?"),
      regexp_extract(noScheme, "\\?(.*)$", 1)).otherwise(lit(""))
    val hostPath = regexp_replace(noScheme, "\\?.*$", "")
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(hostPath, "^[^/]*", 0)),
        "^www\\.", ""),
      ":(80|443)$", "")
    val path0 = regexp_replace(regexp_extract(hostPath, "^[^/]*(.*)$", 1),
      "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val keep = filter(split(rawQuery, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !TrackingParams.map(t => p === t || p.startsWith(t + "="))
          .reduce(_ || _))
    val query = array_join(array_sort(keep), "&")
    concat(host, path, when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Canonical-URL dedup summary: one row per canonical key with the
    * member count and the kept (smallest) id — the crawl-side twin of
    * exact text dedup. One keyed shuffle on the canonical key. */
  def dedupByUrl(df: DataFrame, id: Column, url: Column): DataFrame =
    df.select(id.as("doc_id"), canonicalUrl(url).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
}
