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

  /** URL/domain blocklist gate — the FIRST gate a crawl pipeline runs
    * (the RefinedWeb/UT1 move: a blocked domain or URL pattern kills
    * the document before any text is even extracted, so every
    * downstream stage sees a smaller corpus). Per input doc: the
    * canonical URL and host, the matched blocklist domain (null =
    * none), a b3-style ";"-joined reason string ("" = clean), and the
    * `allowed` verdict.
    *
    * Domain matching is UT1 semantics: a blocklist entry hits the
    * exact host AND every subdomain of it (`example.com` blocks
    * `a.b.example.com`). The host's suffix set is bounded (one entry
    * per label), so the check is a bounded fan-out, never a scan of
    * the blocklist per row. When several suffixes match, the
    * lexicographically smallest blocked domain is reported
    * (deterministic, engine-identical).
    *
    * Scale shape: lists up to `inlineThreshold` compile into the plan
    * as a literal array (map-only, zero shuffle — the entry's path);
    * larger lists (UT1 is millions of domains) take the broadcast-join
    * path: explode the bounded suffixes, broadcast-hash-join the
    * blocklist, aggregate the hits (a shuffle of HITS only), one
    * doc_id-keyed left join back (AQE broadcasts it when the hit set
    * is small). Pattern rules are map-only `rlike` columns either way;
    * keep patterns free of `\s`-style shorthands so Java regex and the
    * oracle's RE2-ish engine agree.
    *
    * @param patternRules (rule_name, regex) pairs matched against the
    *                     CANONICAL url; every matching rule is
    *                     reported (b3's all-reasons discipline) */
  /** The bounded per-label suffix set of a host column. */
  private def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels)), "."))
  }

  /** The inline-path blocked-domain expression: lexicographically
    * smallest blocklist entry matching the host's suffix set (null =
    * clean). Pure codegen — the list compiles into the plan. */
  private def inlineBlockedDomain(host: Column,
                                  blockedDomains: Seq[String]): Column =
    if (blockedDomains.isEmpty) lit(null).cast("string")
    else array_min(array_intersect(hostSuffixes(host),
      lit(blockedDomains.toArray)))

  /** The gate's reason string from a domain verdict + the canonical
    * URL — shared by every gate form so they cannot drift. A NULL url
    * (canonicalization propagates null) is an explicit `no_url`
    * verdict, NOT a clean pass: every downstream predicate on a null
    * canon evaluates to null, which `concat_ws` silently skips — so
    * without this rule a record with a missing URL would sail through
    * the stage-0 gate. A crawl record without a provenance URL is
    * unauditable and blocks. */
  private def reasonExpr(blockedDomain: Column, canon: Column,
                         patternRules: Seq[(String, String)]): Column =
    concat_ws(";",
      when(canon.isNull, lit("no_url")) +:
        when(blockedDomain.isNotNull,
          concat(lit("blocked_domain:"), blockedDomain)) +:
        patternRules.map { case (name, pat) =>
          when(canon.rlike(pat), lit(s"url_pattern:$name"))
        }: _*)

  /** [[blocklistGate]]'s verdict as ONE map-only boolean COLUMN over a
    * raw URL — the STREAMING-SAFE form (a streaming frame cannot take
    * the big-list join path, and a stage-0 firehose gate must not
    * shuffle): canonicalize, suffix-match the compiled-in blocklist,
    * apply the pattern rules. Use it as a `filter` ahead of any text
    * work — the RefinedWeb order; UT1-scale lists belong in the batch
    * pre-gate, not a per-event stream. */
  def isAllowed(url: Column, blockedDomains: Seq[String],
                patternRules: Seq[(String, String)] = Nil): Column = {
    val canon = canonicalUrl(url)
    val host = regexp_extract(canon, "^[^/?]*", 0)
    length(reasonExpr(inlineBlockedDomain(host, blockedDomains), canon,
      patternRules)) === 0
  }

  def blocklistGate(df: DataFrame, id: Column, url: Column,
                    blockedDomains: Seq[String],
                    patternRules: Seq[(String, String)] = Nil,
                    inlineThreshold: Int = 1024): DataFrame = {
    val canon = df.select(id.as("doc_id"), canonicalUrl(url).as("canon_url"))
      .withColumn("host", regexp_extract(col("canon_url"), "^[^/?]*", 0))
    val suffixes = hostSuffixes(col("host"))
    val withDom: DataFrame =
      if (blockedDomains.size <= inlineThreshold)
        // literal-array path: pure codegen, the streaming-safe form
        canon.withColumn("blocked_domain",
          inlineBlockedDomain(col("host"), blockedDomains))
      else {
        val spark = df.sparkSession
        import spark.implicits._
        val bl = broadcast(blockedDomains.toDF("blocked_domain"))
        val hits = canon.select(col("doc_id"), explode(suffixes).as("sfx"))
          .join(bl, col("sfx") === col("blocked_domain"))
          .groupBy("doc_id")
          .agg(min(col("blocked_domain")).as("blocked_domain"))
        canon.join(hits, Seq("doc_id"), "left")
      }
    withDom
      .withColumn("reason",
        reasonExpr(col("blocked_domain"), col("canon_url"), patternRules))
      .withColumn("allowed", length(col("reason")) === 0)
  }
}
