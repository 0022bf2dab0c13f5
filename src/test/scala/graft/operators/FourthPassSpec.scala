package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.text.{Html, TextAnalysis, Urls}

/** Hand-case specs for the round-5 fourth-pass operator families
  * (g24-g26, t17, d13, m5/m6, b6). The driver's DuckDB oracle covers
  * the sf0.01 runs; these pin the semantics on adversarial inputs the
  * synthetic corpus can't produce. */
class FourthPassSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("denseMonthly zero-fills gap months inside the global bounds") {
    val df = Seq(
      ("a", ts("2024-01-15 00:00:00"), 10.0),
      ("a", ts("2024-03-10 00:00:00"), 20.0),
      ("b", ts("2024-02-01 00:00:00"), 5.0)
    ).toDF("g", "d", "v")
    val out = Measures.denseMonthly(df, col("g"), col("d"), col("v"))
      .orderBy("grp", "yr", "mo").collect()
    // grid = 2 groups x 3 months (Jan..Mar from the GLOBAL bounds)
    assert(out.length === 6)
    val aFeb = out.find(r => r.getString(0) == "a" && r.getInt(2) == 2).get
    assert(aFeb.getLong(3) === 0L && aFeb.getDouble(4) === 0.0)
    val bFeb = out.find(r => r.getString(0) == "b" && r.getInt(2) == 2).get
    assert(bFeb.getLong(3) === 1L && bFeb.getDouble(4) === 5.0)
  }

  test("shareOfTotal: shares of group and grand total, hand case") {
    val df = Seq(("a", "x", 10.0), ("a", "y", 30.0), ("b", "x", 60.0))
      .toDF("g", "s", "v")
    val out = Measures.shareOfTotal(df, col("g"), col("s"), col("v"))
      .orderBy("grp", "sub").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))).toSeq === Seq(
      ("a", "x", 10.0, 0.25, 0.1),
      ("a", "y", 30.0, 0.75, 0.3),
      ("b", "x", 60.0, 1.0, 0.6)))
  }

  test("movingAverage: trailing window and running total, hand case") {
    val df = Seq(
      ("a", ts("2024-01-05 00:00:00"), 10.0),
      ("a", ts("2024-01-20 00:00:00"), 20.0),
      ("a", ts("2024-02-10 00:00:00"), 30.0),
      ("a", ts("2024-04-01 00:00:00"), 40.0)
    ).toDF("g", "d", "v")
    val out = Measures.movingAverage(df, col("g"), col("d"), col("v"), window = 3)
      .orderBy("yr", "mo").collect()
    // months present: Jan(30), Feb(30), Apr(40) — no densification here
    assert(out.map(r => (r.getInt(2), r.getDouble(4), r.getDouble(5),
      r.getDouble(6))).toSeq === Seq(
      (1, 30.0, 30.0, 30.0),
      (2, 30.0, 30.0, 60.0),
      (4, 40.0, round3(100.0 / 3), 100.0)))
  }
  private def round3(v: Double): Double = math.round(v * 1e6) / 1e6

  test("charsetAudit counts each damage class exactly once") {
    val clean = "plain ascii text"
    val dirty = "café �\u0001  x"
    val out = TextAnalysis.charsetAudit(
      Seq((1L, clean), (2L, dirty)).toDF("id", "t"), col("id"), col("t"))
      .orderBy("doc_id").collect()
    val c = out(0)
    assert((c.getLong(2), c.getLong(3), c.getLong(4), c.getLong(5),
      c.getBoolean(6)) === (0L, 0L, 0L, 0L, true))
    val d = out(1)
    assert(d.getLong(1) === dirty.length.toLong)
    assert((d.getLong(2), d.getLong(3), d.getLong(4), d.getLong(5),
      d.getBoolean(6)) === (2L, 1L, 1L, 1L, false))
  }

  test("fixText repairs each audited damage class and NFC-composes") {
    // decomposed cafe+U+0301, a control char, U+FFFD, a whitespace run
    val dirty = "cafe\u0301 \u0007 \uFFFD  x"
    val fixed = Seq(Tuple1(dirty)).toDF("t")
      .select(TextAnalysis.fixText(col("t")).as("f")).head().getString(0)
    assert(fixed === "caf\u00e9 x")
    // repaired text passes its own audit clean
    val audit = TextAnalysis.charsetAudit(
      Seq((1L, fixed)).toDF("id", "t"), col("id"), col("t")).head()
    // col 2 is the non-ascii count: the composed e-acute legitimately
    // stays non-ascii; the DAMAGE columns must read zero
    assert((audit.getLong(3), audit.getLong(4), audit.getLong(5))
      === (0L, 0L, 0L))
  }

  test("fixText is idempotent over adversarial inputs") {
    // every damage class, mixed and repeated, plus already-clean text:
    // U+FFFD runs, control runs, whitespace runs, decomposed e+U+0301,
    // multi-combining s+underdot+overdot (NFC-composes to U+1E69)
    val nasty = Seq("", "   ", "\uFFFD\uFFFD", "a\u0001\u0002bc",
      "x\t\n\r y", "e\u0301e\u0301", "caf\u00e9", "plain ascii",
      " \uFFFD cafe\u0301 mix \u000b of\tall", "s\u0323\u0307",
      "\u1e69")
    val once = nasty.toDF("t").select(TextAnalysis.fixText(col("t")).as("f"))
    val twice = once.select(TextAnalysis.fixText(col("f")).as("f2"))
    val pairs = once.collect().map(_.getString(0))
      .zip(twice.collect().map(_.getString(0)))
    pairs.foreach { case (a, b) =>
      assert(a === b, s"not idempotent: ${a.codePoints().toArray.toSeq}" +
        s" vs ${b.codePoints().toArray.toSeq}") }
    // and the two NFC-equivalent spellings converge to one form
    val forms = Seq("s\u0323\u0307", "\u1e69").toDF("t")
      .select(TextAnalysis.fixText(col("t"))).distinct().collect()
    assert(forms.length === 1 && forms(0).getString(0) === "\u1e69")
  }

  test("Html.extract keeps content blocks, drops boilerplate by density") {
    val body = "this paragraph carries the actual article content of the " +
      "page and is comfortably longer than the minimum character gate"
    val page = "<html><head><title>Short</title>" +
      "<style>p { color: red; } .hidden { display: none; }</style>" +
      "<script>var tracking = 'do not extract me ever';</script></head>" +
      "<body><div><a href=\"/\">Home</a> <a href=\"/b\">Blog</a> " +
      "<a href=\"/c\">Contact page</a></div>" +
      "<p>" + body + "</p>" +
      "<p>Tom &amp; Jerry &lt;3 say &quot;hi&quot; and stay " +
      "long enough to pass the length gate easily</p>" +
      "<div>More <a href=\"/n\">next article teaser link text</a></div>" +
      "</body></html>"
    val out = Html.extract(Seq((1L, page)).toDF("doc_id", "html"),
      col("doc_id"), col("html")).head()
    val extracted = out.getString(1)
    // content survives; entities decoded; boilerplate and invisible
    // subtrees gone
    assert(extracted.contains(body))
    assert(extracted.contains("Tom & Jerry <3 say \"hi\""))
    assert(!extracted.contains("tracking") && !extracted.contains("color"))
    assert(!extracted.contains("Home") && !extracted.contains("teaser"))
    assert(out.getLong(3) === 2L) // exactly the two content paragraphs
  }

  test("Html link density gate: mostly-anchor blocks die even when long") {
    // long block, but >1/3 of its chars are anchor text
    val page = "<p>" + ("x" * 40) + " <a href=\"/\">" + ("y" * 40) +
      "</a></p><p>" + ("z" * 40) + " plain tail with no links at all</p>"
    val out = Html.extract(Seq((1L, page)).toDF("doc_id", "html"),
      col("doc_id"), col("html")).head()
    assert(out.getLong(3) === 1L)
    assert(out.getString(1).startsWith("z" * 40))
  }

  test("canonicalUrl collapses the classic crawl variants to one key") {
    val variants = Seq(
      "HTTP://WWW.Site.com:80/a/b/?utm_source=x&q=1&lang=en#frag",
      "https://site.com/a/b?lang=en&q=1",
      "https://www.site.com:443/a/b/?q=1&utm_campaign=c&lang=en&fbclid=zz",
      "site.com/a/b?lang=en&gclid=2&q=1&ref=home")
    val out = variants.toDF("url").select(Urls.canonicalUrl(col("url")).as("c"))
      .distinct().collect()
    assert(out.map(_.getString(0)).toSeq === Seq("site.com/a/b?lang=en&q=1"))
    // bare host, no query: root path, no '?'
    val bare = Seq("https://Host.org").toDF("url")
      .select(Urls.canonicalUrl(col("url"))).head().getString(0)
    assert(bare === "host.org/")
  }

  test("dedupByUrl keeps the smallest id per canonical key") {
    val df = Seq(
      (5L, "https://a.com/x?b=1&a=2"),
      (3L, "http://WWW.A.com/x/?a=2&b=1&utm_medium=m"),
      (9L, "https://a.com/y")
    ).toDF("id", "url")
    val out = Urls.dedupByUrl(df, col("id"), col("url"))
      .orderBy("canon_url").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("a.com/x?a=2&b=1", 2L, 3L), ("a.com/y", 1L, 9L)))
  }

  test("blocklistGate: UT1 subdomain semantics, pattern rules, reason format") {
    val df = Seq(
      (1L, "https://ads.example.com/x"),          // exact blocked host
      (2L, "https://cdn.ads.example.com/x"),      // subdomain of blocked
      (3L, "https://example.com/x"),              // PARENT of blocked: clean
      (4L, "https://notads.example.com/x"),       // label boundary: clean
      (5L, "https://ok.org/catalog?session=9"),   // pattern rule hit
      (6L, "https://ads.example.com/c?session=1"),// domain + pattern: both reasons
      (7L, "https://WWW.Ads.Example.COM:443/y"))  // canonicalized then matched
      .toDF("id", "url")
    val rules = Seq(("session_param", "[?&]session="))
    val got = Urls.blocklistGate(df, col("id"), col("url"),
      Seq("ads.example.com"), rules)
      .select("doc_id", "blocked_domain", "reason", "allowed")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getString(2), r.getBoolean(3))).toMap
    assert(got(1L) === ((Some("ads.example.com"), "blocked_domain:ads.example.com", false)))
    assert(got(2L) === ((Some("ads.example.com"), "blocked_domain:ads.example.com", false)))
    assert(got(3L) === ((None, "", true)))
    assert(got(4L) === ((None, "", true)))
    assert(got(5L) === ((None, "url_pattern:session_param", false)))
    assert(got(6L)._2 === "blocked_domain:ads.example.com;url_pattern:session_param")
    assert(got(7L)._1 === Some("ads.example.com"),
      "WWW./case/port canonicalization must happen before the match")
  }

  test("blocklistGate: broadcast-join path agrees with the inline path") {
    val df = Seq(
      (1L, "https://ads.example.com/x"),
      (2L, "https://cdn.ads.example.com/x"),
      (3L, "https://clean.org/y?page=1")).toDF("id", "url")
    val doms = Seq("ads.example.com", "never.hit")
    val rules = Seq(("p1", "[?&]page=1($|&)"))
    def rows(threshold: Int) =
      Urls.blocklistGate(df, col("id"), col("url"), doms, rules, threshold)
        .select("doc_id", "blocked_domain", "reason", "allowed")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)),
          r.getString(2), r.getBoolean(3))).toSet
    assert(rows(1024) === rows(0), // 0 forces the explode+join path
      "both blocklist implementations must produce identical verdicts")
    // smallest matching suffix wins deterministically when several match
    val multi = Urls.blocklistGate(
      Seq((1L, "https://a.b.com/x")).toDF("id", "url"), col("id"), col("url"),
      Seq("a.b.com", "b.com"), Nil)
      .select("blocked_domain").head().getString(0)
    assert(multi === "a.b.com", "lexicographically smallest matching domain")
  }

  test("isAllowed (the streaming-safe gate column) equals blocklistGate's verdict") {
    val df = Seq(
      (1L, "https://ads.example.com/x"),
      (2L, "https://cdn.ads.example.com/x"),
      (3L, "https://example.com/x"),
      (4L, "https://ok.org/catalog?session=9"),
      (5L, "https://WWW.Ads.Example.COM:443/y"),
      (6L, "https://fine.net/a?page=2")).toDF("id", "url")
    val doms = Seq("ads.example.com")
    val rules = Seq(("session_param", "[?&]session="))
    val frame = Urls.blocklistGate(df, col("id"), col("url"), doms, rules)
      .select("doc_id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expr = df.select(col("id"),
        Urls.isAllowed(col("url"), doms, rules).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(expr === frame, "the column form and the frame form must agree")
  }

  test("a null URL is blocked with reason no_url in BOTH gate forms " +
    "(a missing provenance URL must not sail through stage 0)") {
    val df = Seq((1L, Some("https://clean.org/x")), (2L, None))
      .toDF("id", "url")
    val doms = Seq("ads.example.com")
    // frame form, both list paths
    for (threshold <- Seq(1024, 0)) {
      val got = Urls.blocklistGate(df, col("id"), col("url"), doms, Nil,
          threshold)
        .select("doc_id", "reason", "allowed").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
      assert(got(1L) === (("", true)))
      assert(got(2L) === (("no_url", false)),
        s"null url must be parked with an explicit reason: ${got(2L)}")
    }
    // streaming-safe column form agrees
    val ok = df.select(col("id"),
        Urls.isAllowed(col("url"), doms).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(ok === Map(1L -> true, 2L -> false))
  }

  test("energyWindows: flat frames silent, varied frames not") {
    // asset 1: 256 constant bytes -> 4 frames (stride 4 -> offsets 0; 256
    // bytes = offsets 0..192 by 256 hop -> 1 frame), all flat
    val flat = Array.fill(300)('m'.toByte)
    val varied = Array.tabulate(300)(i => if (i % 8 < 4) 'a'.toByte else 'z'.toByte)
    val df = Seq((1L, flat), (2L, varied)).toDF("asset_id", "payload")
    val out = Multimodal.energyWindows(df, frameBytes = 64, stride = 4,
        subWindows = 8, flatThreshold = 4.0)
      .orderBy("asset_id").collect()
    val f = out(0)
    assert(f.getLong(1) === 1L && f.getLong(2) === 1L)
    assert(f.getDouble(3) === 'm'.toInt.toDouble)
    val v = out(1)
    // alternating 4a/4z: every 8-byte sub-window has the same mean ->
    // flatness 0 -> silent by the flatness test (it measures VARIATION
    // across sub-windows, not within)
    assert(v.getLong(1) === 1L && v.getLong(2) === 1L)
    assert(v.getDouble(3) === ('a'.toInt + 'z'.toInt) / 2.0)
  }

  test("energyWindows flags frames whose sub-windows diverge") {
    // first 32 bytes 'a', second 32 'z': sub-window means differ by 25
    val split = Array.tabulate(64)(i => if (i < 32) 'a'.toByte else 'z'.toByte)
    val df = Seq((1L, split)).toDF("asset_id", "payload")
    val out = Multimodal.energyWindows(df, frameBytes = 64, stride = 1,
      subWindows = 8, flatThreshold = 4.0).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 1L && out(0).getLong(2) === 0L)
  }

  test("headerFields parses magic, big-endian uint16s, and body size") {
    val payload = Array[Byte]('P', 'G', 0x01, 0x00, 0x00, 0x40, 1, 2, 3)
    val out = Multimodal.headerFields(
      Seq((1L, payload)).toDF("asset_id", "payload")).collect()
    val r = out(0)
    assert(r.getString(1) === "PG")
    assert(r.getLong(2) === 256L && r.getLong(3) === 64L)
    assert(r.getLong(4) === 3L)
    // truncated header -> dropped
    val short = Multimodal.headerFields(
      Seq((2L, Array[Byte](1, 2, 3))).toDF("asset_id", "payload"))
    assert(short.count() === 0L)
  }

  test("sceneCuts: flat run has no cuts, a hard transition is one cut") {
    val flat = Array.fill(24)('m'.toByte)
    val jump = Array.fill(8)('a'.toByte) ++ Array.fill(16)('z'.toByte)
    val df = Seq((1L, flat), (2L, jump)).toDF("asset_id", "payload")
    // frameBytes=8, stride=1 -> frames at offsets 0,8,16 (3 per asset)
    val out = Multimodal.sceneCuts(df, frameBytes = 8, stride = 1,
        subWindows = 2, cutThreshold = 10.0)
      .orderBy("asset_id").collect()
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) === 0L
      && out(0).getLong(3) === -1L)
    // asset 2: a->z between frames 0 and 1 (l1 = 2*25 = 50), z->z after
    assert(out(1).getLong(1) === 3L && out(1).getLong(2) === 1L
      && out(1).getLong(3) === 1L)
  }
}
