package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ann.Knn

/** Hand-case specs for the round-8 operators. */
class EighthPassSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("filteredTopK: neighbors come only from the query's own slice") {
    // label 0: q1 nearest c10 then c11; label 1: q2's only candidate
    // is c12 — c10 (closer in space, wrong label) must NOT appear
    val emb = Seq(
      (1L, vec(1, 0), 0), (2L, vec(0, 1), 1),
      (10L, vec(0.9, 0.1), 0), (11L, vec(0.5, 0.5), 0),
      (12L, vec(0.1, 0.9), 1), (13L, vec(0.95, 0.05), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Knn.filteredTopK(emb.filter(col("vec_id") < 10),
      emb.filter(col("vec_id") >= 10), Seq("label"), k = 2)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 12L)))
    // an underfilled slice yields fewer rows, never cross-label fill
    assert(!out.exists { case (q, _, n) => q == 2L && n != 12L })
  }

  test("filteredTopK result equals brute force restricted per slice") {
    val emb = (0L until 60L).map(i =>
      (i, vec(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1)),
        (i % 3).toInt)).toDF("vec_id", "embedding", "label")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val got = Knn.filteredTopK(q, c, Seq("label"), k = 3)
      .collect().map(_.toString).sorted
    val want = (0 until 3).flatMap { l =>
      Knn.bruteForceTopK(q.filter(col("label") === l),
        c.filter(col("label") === l), k = 3).collect()
    }.map(_.toString).sorted
    assert(got.sameElements(want),
      "filtered search must equal per-slice brute force")
  }

  test("PipelineRunner: retry, failure isolation, deterministic log") {
    val attempts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    def stage(name: String, failFirst: Int, rows: Long,
              maxAttempts: Int = 2): PipelineStage =
      PipelineStage(name, maxAttempts) { () =>
        attempts(name) += 1
        if (attempts(name) <= failFirst) sys.error(s"$name transient")
        rows
      }
    // b succeeds on its 2nd try; c exhausts retries; d is skipped
    val log = PipelineRunner.run(spark, "run1", Seq(
      stage("a", failFirst = 0, rows = 10),
      stage("b", failFirst = 1, rows = 20),
      stage("c", failFirst = 99, rows = 30, maxAttempts = 3),
      stage("d", failFirst = 0, rows = 40)))
      .orderBy("stage_no").collect()
      .map(r => (r.getString(2), r.getString(3), r.getInt(4), r.getLong(5)))
    assert(log.toSeq === Seq(
      ("a", "succeeded", 1, 10L), ("b", "succeeded", 2, 20L),
      ("c", "failed", 3, 0L), ("d", "skipped", 0, 0L)))
    assert(attempts("d") === 0, "skipped stages must never execute")
    // misuse throws; stage failure never does
    intercept[IllegalArgumentException] {
      PipelineRunner.run(spark, "r", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      PipelineRunner.run(spark, "r",
        Seq(stage("x", 0, 1), stage("x", 0, 1)))
    }
  }

  test("PipelineRunner: the log persists through the SnapshotStore MERGE pattern") {
    import graft.sources.SnapshotStore
    val dir = java.nio.file.Files.createTempDirectory("graft-runlog").toString
    val l1 = PipelineRunner.run(spark, "run1",
      Seq(PipelineStage("ingest")(() => 5L), PipelineStage("publish")(() => 3L)))
    SnapshotStore.mergeInto(l1, dir, Seq("run_id", "stage"))
    // a re-run (same run_id) upserts its own rows; a new run appends
    val l2 = PipelineRunner.run(spark, "run2",
      Seq(PipelineStage("ingest")(() => 7L), PipelineStage("publish")(() => 2L)))
    SnapshotStore.mergeInto(l2, dir, Seq("run_id", "stage"))
    SnapshotStore.mergeInto(l1, dir, Seq("run_id", "stage"))
    val all = SnapshotStore.read(spark, dir).get
    assert(all.count() === 4L, "replayed run must upsert, not duplicate")
    assert(all.filter(col("run_id") === "run2" && col("stage") === "ingest")
      .head().getAs[Long]("rows") === 7L)
  }

  test("gopherRules: each rule fires on its own pathology, clean doc keeps") {
    import graft.text.TextAnalysis
    val stops = "the of and that have with be to" // 8 distinct stop types
    val clean = (s"$stops lorem ipsum dolor sit amet " * 8).trim // 112 words
    val docs = Seq(
      1L -> clean,
      2L -> s"$stops tiny",                       // word_count (9 words)
      3L -> (s"$stops " + "aa bb cc " * 16).trim, // mean len < 3
      4L -> (clean + " " + "#### " * 4).trim,     // 16 '#' / 116 > 0.1
      5L -> (s"• $stops\n" * 9 + "plain tail line"), // 9/10 bullets > 0.9... wait 0.9 is <=; 9/10=0.9 passes — use 10/11? see below
      6L -> (s"$stops...\n" * 4 + "plain\nplain2"),  // 4/6 ellipsis > 0.3
      7L -> (s"$stops " + "12 34 56 78 90 " * 8).trim, // alpha 8/48 < 0.8
      8L -> (clean.replaceAll("\\b(the|of|and|that|have|with|be|to)\\b", "x")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, col("doc_id"), col("text"),
      minWords = 20).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(9), r.getString(10))).toMap
    assert(out(1L) === ((true, "")))
    assert(out(2L)._2.contains("word_count"))
    assert(out(3L)._2.contains("word_length"))
    assert(out(4L)._2.contains("symbol_ratio"))
    assert(out(6L)._2.contains("ellipsis_lines"))
    assert(out(7L)._2.contains("alpha_words"))
    assert(out(8L)._2.contains("stop_words"))
    // bullet rule: 10 of 10 lines bulleted fails, 9 of 10 passes (<= 0.9)
    val bul = TextAnalysis.gopherRules(
      Seq(10L -> Array.fill(10)(s"• $stops line").mkString("\n"),
          11L -> (Array.fill(9)(s"• $stops line") :+ "plain").mkString("\n"))
        .toDF("doc_id", "text"), col("doc_id"), col("text"), minWords = 1)
      .collect().map(r => r.getLong(0) -> r.getString(10)).toMap
    assert(bul(10L).contains("bullet_lines"))
    assert(!bul(11L).contains("bullet_lines"))
  }

  test("crossDocLineDedup: global keep-first, blanks survive, md5 checks out") {
    import graft.dedup.TextDedup
    import java.security.MessageDigest
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "header\nalpha\n\nbeta"),   // owns header/alpha/beta; blank kept
      (2L, "header\ngamma\nalpha"),    // header+alpha duped -> gamma only
      (3L, "gamma\nheader\n\n\ndelta") // everything duped but delta; 2 blanks
    ).toDF("doc_id", "text")
    val out = TextDedup.crossDocLineDedup(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((4L, 4L, md5hex("header\nalpha\n\nbeta"))))
    assert(out(2L) === ((3L, 1L, md5hex("gamma"))))
    assert(out(3L) === ((5L, 3L, md5hex("\n\ndelta"))))
  }

  test("containmentPairs: fragment⊂whole scores 1.0 where Jaccard is low") {
    import graft.dedup.TextDedup
    val docs = Seq(
      (1L, "a b c d e"),                      // 3 shingles, all inside doc 2
      (2L, "a b c d e f g h i j k l m"),      // 11 shingles
      (3L, "x y z w v"))                      // disjoint
      .toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, col("doc_id"), col("text"),
      minContainment = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 2L, 3L, 1.0)))
    // the same pair under Jaccard: 3/11 — a 0.5 threshold misses it
    assert(TextDedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      minJaccard = 0.5).count() === 0L)
    // capped branch (hashed domain) agrees with the exhaustive one here
    val capped = TextDedup.containmentPairs(docs, col("doc_id"), col("text"),
      minContainment = 0.9, maxDocFreq = Some(10)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(capped.toSeq === out.toSeq)
  }

  test("windowFunnel: the deadline drops late converters; counts non-increasing") {
    import graft.streaming.{Events => Ev}
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // u1 converts in time; u2's click is 2h after the view (misses a
    // 1h window) so u2 leaves the funnel at step 2 AND step 3 even
    // though its purchase would qualify against its own click
    val ev = Seq(
      (1L, t(0), 1L, "view"), (2L, t(600), 1L, "click"), (3L, t(1200), 1L, "buy"),
      (4L, t(0), 2L, "view"), (5L, t(7200), 2L, "click"), (6L, t(7300), 2L, "buy"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val bounded = Ev.windowFunnel(ev, Seq("view", "click", "buy"), 3600L)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(bounded.toSeq === Seq((1, 2L), (2, 1L), (3, 1L)))
    // the unbounded funnel counts u2 everywhere — the overstatement
    val unbounded = Ev.funnel(ev, Seq("view", "click", "buy"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(unbounded.toSeq === Seq((1, 2L), (2, 2L), (3, 2L)))
  }

  test("clusterSizeHistogram + dedupWeights over hand-built components") {
    import graft.dedup.DupClusters
    // pairs: {1,2,3} one component, {7,8} another; 9 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val cl = DupClusters.connectedComponents(pairs)
    val hist = DupClusters.clusterSizeHistogram(cl).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(hist.toSeq === Seq((2L, 1L, 2L), (3L, 1L, 3L)))
    val docs = Seq(1L, 2L, 3L, 7L, 8L, 9L).toDF("doc_id")
    val w = DupClusters.dedupWeights(docs, "doc_id", cl).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w(1L) === ((1L, 1.0 / 3)) && w(3L) === ((1L, 1.0 / 3)))
    assert(w(8L) === ((7L, 0.5)))
    assert(w(9L) === ((9L, 1.0)), "singletons weight 1.0 with own id")
    // expected mass per cluster is exactly one doc
    assert(math.abs(w.values.map(_._2).sum - 3.0) < 1e-12)
  }

  test("linearFuse: min-max normalization, missing-leg zeros, constant list = 1.0") {
    import graft.text.Search
    // q1 vec: d1=0.9 d2=0.5 d3=0.1 -> norm 1.0/0.5/0.0
    // q1 lex: d2=10.0 d4=10.0 (constant list) -> both norm 1.0
    val vec = Seq((1L, 10L, 0.9), (1L, 20L, 0.5), (1L, 30L, 0.1))
      .toDF("query_id", "doc_id", "score")
    val lex = Seq((1L, 20L, 10.0), (1L, 40L, 10.0))
      .toDF("query_id", "doc_id", "score")
    val out = Search.linearFuse(vec, lex, k = 4, alpha = 0.5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    // d20: 0.5*0.5 + 0.5*1.0 = 0.75; d10: 0.5*1.0 = 0.5;
    // d40: 0.5*1.0 = 0.5 (tie with d10 -> id order); d30: 0.0
    assert(out.toSeq === Seq((20L, 0.75), (10L, 0.5), (40L, 0.5), (30L, 0.0)))
    // α=1.0 reduces to the vector leg's normalized order
    val pure = Search.linearFuse(vec, lex, k = 2, alpha = 1.0)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(pure.toSeq === Seq(10L, 20L))
  }

  test("sentenceStats: segmentation and per-sentence word stats") {
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "One two three. Four five! Six seven eight nine?"),
      (2L, "no terminal punctuation at all here")).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceStats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((3L, 9L, 4L, 3.0)))
    assert(out(2L) === ((1L, 6L, 6L, 6.0)), "unpunctuated doc = one sentence")
  }

  test("crossDedupApply: incoming loses near-dups of the reference, reference untouched") {
    import graft.dedup.TextDedup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ref = Seq((1L, base)).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base + " lambda"),                       // near-dup of ref -> drops
      (11L, "totally different words entirely here now one two three"),
      (12L, base + " lambda")                        // also near-dup -> drops
    ).toDF("doc_id", "text")
    val out = TextDedup.crossDedupApply(ref, incoming, "doc_id", col("text"),
      minJaccard = 0.5).collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(11L),
      s"only the unrelated incoming doc survives, got ${out.mkString(",")}")
    // incoming-internal near-dups (10 vs 12) are NOT this operator's
    // job — both dropped here only because both matched the reference;
    // an incoming-only near-dup pair survives intact
    val inc2 = Seq((20L, "one two three four five six seven eight nine ten"),
      (21L, "one two three four five six seven eight nine eleven"))
      .toDF("doc_id", "text")
    assert(TextDedup.crossDedupApply(ref, inc2, "doc_id", col("text"),
      minJaccard = 0.3).count() === 2L)
  }

  test("evalLeakage: per-eval-item breadth, clean items absent") {
    import graft.dedup.Decontaminate
    val phrase = "alpha beta gamma delta epsilon"
    val train = Seq(
      (1L, s"one two three $phrase"), (2L, s"$phrase four five six"),
      (3L, "nothing shared here at all seven words")).toDF("doc_id", "text")
    val eval = Seq((100L, s"question about $phrase"),
      (101L, "completely clean eval item words here")).toDF("doc_id", "text")
    val out = Decontaminate.evalLeakage(train, eval,
      col("doc_id"), col("doc_id"), col("text"), n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((100L, 2L, 1L)),
      s"E100 leaked into docs 1,2 via one shared 5-gram; got ${out.mkString(",")}")
  }

  test("scriptMixAudit: homoglyph words flagged, dominant script correct") {
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "plain latin text only"),
      (2L, "привет мир как дела"),          // Cyrillic dominant
      (3L, "pay with pаypal now"),          // Cyrillic а inside a Latin word
      (4L, "12345 !!! ...")).toDF("doc_id", "text") // no script at all
    val out = TextAnalysis.scriptMixAudit(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5), r.getString(6)))).toMap
    assert(out(1L) === ((18L, 0L, 0L, "latin")))
    assert(out(2L)._4 === "cyrillic" && out(2L)._3 === 0L)
    assert(out(3L)._3 === 1L, "pаypal is a mixed-script word")
    assert(out(3L)._4 === "latin")
    assert(out(4L) === ((0L, 0L, 0L, "none")))
  }

  test("sessionStats: counts, duration stats and bounce rate on hand sessions") {
    import graft.streaming.{Events => Ev}
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // u1: one 2-event session (600s) + one bounce 2h later;
    // u2: one bounce. => 3 sessions, 2 users, bounce rate 2/3
    val ev = Seq(
      (1L, t(0), 1L, "view", 1.0, "{}"), (2L, t(600), 1L, "click", 1.0, "{}"),
      (3L, t(10000), 1L, "view", 1.0, "{}"), (4L, t(0), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Ev.sessionStats(ev, gapMinutes = 30).collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.3333) // mean events (2+1+1)/3, 4dp
    assert(r.getDouble(3) === 200.0)   // mean duration (600+0+0)/3
    assert(r.getDouble(4) === 0.0)     // p50 of (600,0,0)
    assert(r.getDouble(6) === 0.666667) // bounce rate 6dp
  }

  test("lshRecallAudit: identical pair always found, found is a subset of exact") {
    import graft.dedup.TextDedup
    val many = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), // jaccard 1.0
      (3L, s"$many shared tail here"),                   // shares its tail
      (4L, s"shared tail here ${(50 to 90).map(i => s"v$i").mkString(" ")}"),
      (5L, "x y z q r s t u v w")).toDF("doc_id", "text")
    val r = TextDedup.lshRecallAudit(docs, col("doc_id"), col("text"),
      minJaccard = 0.005).collect().head
    val (nExact, nFound, nMissed, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nExact === 2L, s"expected pairs (1,2) and (3,4), got $nExact")
    assert(nFound >= 1L, "the identical pair shares every minhash — always found")
    assert(nMissed === nExact - nFound && nMissed >= 0L)
    assert(recall === math.rint(nFound.toDouble / nExact * 1e6) / 1e6)
  }

  test("mmrTopK: diversity beats a redundant higher-relevance candidate") {
    // q=(1,0); a=(1,0.1) seeds; b=(1,0.11) is nearly a's duplicate,
    // c=(0.5,0.5) is diverse. At λ=0.3 MMR must pick c over b even
    // though rel(b) > rel(c); at λ=1.0 it degrades to pure relevance.
    val emb = Seq(
      (1L, vec(1, 0), 0), (10L, vec(1, 0.1), 0),
      (11L, vec(1, 0.11), 0), (12L, vec(0.5, 0.5), 0))
      .toDF("vec_id", "embedding", "label")
    val q = emb.filter(col("vec_id") < 10)
    val c = emb.filter(col("vec_id") >= 10)
    val diverse = Knn.mmrTopK(q, c, k = 2, poolSize = 3, lambda = 0.3)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    assert(diverse.toSeq === Seq(10L, 12L), "λ=0.3 must select the diverse c")
    val pure = Knn.mmrTopK(q, c, k = 3, poolSize = 3, lambda = 1.0)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    assert(pure.toSeq === Knn.bruteForceTopK(q, c, k = 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq,
      "λ=1 must reduce to relevance order")
    // underfill: 3 candidates, k wants 3 — all appear exactly once
    assert(pure.distinct.length === 3)
    intercept[IllegalArgumentException] {
      Knn.mmrTopK(q, c, k = 2, poolSize = 3, lambda = 0.75)
    }
  }

  test("topPaths: ordered truncated journeys, deterministic top-k tiebreak") {
    import graft.streaming.{Events => Ev}
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // users 1,2 share view>click>buy; user 3 diverges; user 4 has 10
    // events — the path truncates at maxLen=3
    val rows =
      Seq((1L, 1L, "view"), (2L, 1L, "click"), (3L, 1L, "buy"),
          (1L, 2L, "view"), (2L, 2L, "click"), (3L, 2L, "buy"),
          (1L, 3L, "view"), (2L, 3L, "bounce")) ++
      (1L to 10L).map(i => (i, 4L, s"e$i"))
    val ev = rows.zipWithIndex
      .map { case ((s, u, e), i) => (i.toLong, t(s), u, e) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Ev.topPaths(ev, maxLen = 3, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.head === (("view>click>buy", 2L)))
    assert(out.length === 2)
    // ties: both 1-user paths exist; the lexicographically smaller wins
    assert(out(1)._1 === "e1>e2>e3") // '<' "view>bounce" lexicographically
  }
}
