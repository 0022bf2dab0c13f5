package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.{Dsir, NaiveBayes, TextAnalysis}

/** The composed c6 serving stream: gate → watermark dedup → band flag
  * → frozen-NB route → frozen-DSIR threshold → MERGE. The spec's
  * centerpiece is batch parity: the stream's `select` set must equal
  * [[graft.LlmCuration.runSelected]]'s output on the same corpus with
  * the same frozen artifacts, the threshold calibrated from the batch
  * weights (the documented Gumbel-vs-threshold contract: equality
  * holds because the constructed weight gap at the cut exceeds the
  * Gumbel spread; only near-ties may diverge). */
class SelectionPipelineStreamSpec extends SparkSpec {
  import spark.implicits._

  // [stop, unique, topic] triplets: stop_ratio 1/3 and 36 tokens pass
  // the 0.5 quality gate; no 3 consecutive tokens repeat across docs,
  // so there are NO shared word-trigram shingles (the near-dup stage
  // must drop nothing) — while unigram vocab (NB + DSIR features)
  // still separates the topics.
  private val stops = Seq("the", "to", "of", "and", "is", "that")
  private def doc(id: Long, topic: String): String =
    (0 until 12).map(j =>
      s"${stops(j % stops.size)} u${id}x$j ${topic}w${j % 4}").mkString(" ")

  private lazy val alphas = (1L to 6L).map(i => (i, doc(i, "alpha")))
  private lazy val gammas = (11L to 14L).map(i => (i, doc(i, "gamma")))
  private lazy val spamDoc = Seq((21L, doc(21L, "casino")))
  private lazy val pool =
    (alphas ++ gammas ++ spamDoc).toDF("doc_id", "text")
  // labeled: alpha+gamma vocab is 'en', casino vocab is 'spam' (both
  // label classes carry the stopwords, so language ID alone can't
  // separate them — that's the model gate's job)
  private lazy val labeled = (
    (101L to 104L).map(i => (i, doc(i, "alpha"), "en")) ++
    (111L to 114L).map(i => (i, doc(i, "gamma"), "en")) ++
    (121L to 124L).map(i => (i, doc(i, "casino"), "spam")))
    .toDF("doc_id", "text", "label")
  private lazy val target = (201L to 204L).map(i => (i, doc(i, "alpha")))
    .toDF("doc_id", "text")
  // eval: doc 6's exact text — the contaminated alpha must fall at the
  // decontamination firewall in BOTH worlds
  private lazy val eval = Seq((1000L, doc(6L, "alpha"))).toDF("doc_id", "text")

  private lazy val nbM = NaiveBayes.model(labeled, col("text"), col("label")).persist()
  private lazy val nbPri = NaiveBayes.priors(labeled, col("label")).persist()

  /** The model-gate survivors (runSelected's DSIR pool), rebuilt with
    * the public scorer so the frozen DSIR model matches the batch's. */
  private lazy val gated = pool.join(
    NaiveBayes.score(pool, col("doc_id"), col("text"), nbM, nbPri)
      .filter(col("pred") === "en" &&
        col("margin").isNotNull && col("margin") >= 0.0)
      .select("doc_id"),
    Seq("doc_id"))
  private lazy val dsirM = Dsir.model(
    target.select(col("text")), gated, col("text")).persist()

  test("every pool doc passes the gate; the weight gap is clean") {
    val scored = TextAnalysis.qualityFeatures(pool, col("text"))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
    assert(scored.filter(col("quality_score") >= 0.5 &&
      col("lang_pred") === "en").count() === pool.count(),
      "the fixture must pass the quality+language gate in full")
    val w = Dsir.score(gated, col("doc_id"), col("text"), dsirM)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val aMin = (1L to 6L).map(w).min
    val gMax = (11L to 14L).map(w).max
    assert(aMin > gMax + 1.0,
      s"alpha/gamma weights must gap cleanly: $aMin vs $gMax")
  }

  test("streamed select set == batch runSelected (threshold calibrated in the gap)") {
    implicit val sqlCtx = spark.sqlContext
    val batchSelected = graft.LlmCuration.runSelected(
      pool, eval, labeled, target,
      col("doc_id"), col("text"), col("label"),
      keepLabel = "en", minMargin = 0.0, k = 6,
      minQuality = 0.5, lang = Some("en"), minJaccard = 0.1)
      .as[Long].collect().toSet
    assert(batchSelected === Set(1L, 2L, 3L, 4L, 5L),
      s"batch: top-6 = the alphas, decontam drops 6: $batchSelected")
    val w = Dsir.score(gated, col("doc_id"), col("text"), dsirM)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cut = ((1L to 6L).map(w).min + (11L to 14L).map(w).max) / 2
    // the band index: a static corpus containing doc 1's exact text —
    // doc 1 must flag (n_band_hits > 0) yet still route select
    val corpusIndex = graft.dedup.TextDedup.bandIndex(
      Seq((9001L, doc(1L, "alpha"))).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-selp-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-selp-ckpt").toString
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val in = MemoryStream[(Long, String, Timestamp)]
    in.addData(pool.as[(Long, String)].collect().toSeq.sortBy(_._1)
      .zipWithIndex.map { case ((i, t), j) =>
        (i, t, new Timestamp(base + j * 1000L)) })
    val q = SelectionPipelineStream.run(
      in.toDF().toDF("doc_id", "text", "ts"),
      col("doc_id"), col("text"), corpusIndex, eval, col("text"),
      nbM, nbPri, dsirM, dir, ckpt,
      keepLabel = "en", minMargin = 0.0, minWeight = cut)
    try q.processAllAvailable() finally q.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get.persist()
    val routes = snap.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("route")).toMap
    // parity: the stream's select set IS the batch output
    val streamedSelect = routes.filter(_._2 == "select").keySet
    assert(streamedSelect === batchSelected,
      s"stream $streamedSelect != batch $batchSelected")
    // the firewall fired as a ROUTE, eval membership winning over the
    // (high) DSIR weight
    assert(routes(6L) === "drop_contaminated")
    // the model gate fired on the spam doc, DSIR on the off-target docs
    assert(routes(21L) === "drop_model")
    assert((11L to 14L).forall(routes(_) === "drop_dsir"))
    // near-dup candidates FLAG, never drop
    val flags = snap.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_band_hits")).toMap
    assert(flags(1L) > 0L && routes(1L) === "select",
      "a band hit must flag the doc and leave routing to the models")
    assert(flags(2L) === 0L)
    snap.unpersist(): Unit
  }

  test("stage 0 on the firehose: a blocked URL never reaches the pipeline") {
    // the full crawl serving shape: Urls.isAllowed filters the stream
    // BEFORE the quality gate — map-only, streaming-safe (no join path)
    implicit val sqlCtx = spark.sqlContext
    val corpusIndex = graft.dedup.TextDedup.bandIndex(
      Seq((9001L, doc(1L, "alpha"))).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-selp3-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-selp3-ckpt").toString
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val in = MemoryStream[(Long, String, String, Timestamp)]
    in.addData(
      (1L, "https://ok.net/a", doc(1L, "alpha"), new Timestamp(base)),
      (2L, "https://spamfarm.biz/a", doc(2L, "alpha"),
        new Timestamp(base + 1000L)))
    val gated = in.toDF().toDF("doc_id", "url", "text", "ts")
      .filter(graft.text.Urls.isAllowed(col("url"), Seq("spamfarm.biz")))
    val q = SelectionPipelineStream.run(gated,
      col("doc_id"), col("text"), corpusIndex, eval, col("text"),
      nbM, nbPri, dsirM, dir, ckpt,
      keepLabel = "en", minMargin = 0.0, minWeight = 0.0)
    try q.processAllAvailable() finally q.stop()
    val ids = graft.sources.SnapshotStore.read(spark, dir).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L),
      s"the blocked-domain doc must die at stage 0, before any text work: $ids")
  }

  test("runCrawl: URL gate + extraction feed the pipeline; routes match the text form") {
    implicit val sqlCtx = spark.sqlContext
    // wrap each fixture doc in a page whose ONLY content block is the
    // doc text (nav/footer are boilerplate the extractor must strip),
    // so extraction recovers the text verbatim and routing must equal
    // the plain-text stream's
    def page(text: String): String =
      "<html><body><div>nav <a href=\"/\">Home</a> <a href=\"/a\">A</a></div>" +
        s"<p>$text</p>" +
        "<div>footer <a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></div></body></html>"
    val corpusIndex = graft.dedup.TextDedup.bandIndex(
      Seq((9001L, doc(1L, "alpha"))).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dir = java.nio.file.Files.createTempDirectory("graft-selp4-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-selp4-ckpt").toString
    val in = MemoryStream[(Long, String, String, Timestamp)]
    in.addData(
      (1L, "https://ok.net/a", page(doc(1L, "alpha")), new Timestamp(base)),
      (11L, "https://ok.net/b", page(doc(11L, "gamma")), new Timestamp(base + 1000L)),
      (21L, "https://spamfarm.biz/x", page(doc(2L, "alpha")), new Timestamp(base + 2000L)),
      // boilerplate-only page: extraction is empty -> never routed
      (31L, "https://ok.net/c",
        "<html><body><div><a href=\"/\">Home</a> linkfarm <a href=\"/b\">B</a></div></body></html>",
        new Timestamp(base + 3000L)))
    val q = SelectionPipelineStream.runCrawl(
      in.toDF().toDF("doc_id", "url", "html", "ts"),
      col("doc_id"), col("url"), col("html"), Seq("spamfarm.biz"), Nil,
      corpusIndex, eval, col("text"), nbM, nbPri, dsirM, dir, ckpt,
      keepLabel = "en", minMargin = 0.0, minWeight = 0.0)
    try q.processAllAvailable() finally q.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get.collect()
    val routes = snap.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("route")).toMap
    assert(routes.keySet === Set(1L, 11L),
      s"blocked URL (21) and empty extraction (31) must never route: $routes")
    // extraction recovered the text verbatim -> same routing/scores as
    // the plain-text batch replay
    val direct = SelectionPipelineStream.routeBatch(
      Seq((1L, doc(1L, "alpha")), (11L, doc(11L, "gamma"))).toDF("doc_id", "text"),
      corpusIndex, eval, col("text"), nbM, nbPri, dsirM,
      keepLabel = "en", minMargin = 0.0, minWeight = 0.0)
      .select("doc_id", "route", "weight").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Double]("weight"))).toSet
    val streamed = snap.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[String]("route"), r.getAs[Double]("weight"))).toSet
    assert(streamed === direct,
      s"crawl form must equal the text form: $streamed vs $direct")
  }

  test("checkpoint restart: the MERGE sink replays idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val corpusIndex = graft.dedup.TextDedup.bandIndex(
      Seq((9001L, doc(1L, "alpha"))).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-selp2-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-selp2-ckpt").toString
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def start(in: MemoryStream[(Long, String, Timestamp)]) =
      SelectionPipelineStream.run(in.toDF().toDF("doc_id", "text", "ts"),
        col("doc_id"), col("text"), corpusIndex, eval, col("text"),
        nbM, nbPri, dsirM, dir, ckpt,
        keepLabel = "en", minMargin = 0.0, minWeight = 0.0)
    val in = MemoryStream[(Long, String, Timestamp)]
    in.addData((1L, doc(1L, "alpha"), new Timestamp(base)),
      (11L, doc(11L, "gamma"), new Timestamp(base + 1000L)))
    val q1 = start(in)
    try q1.processAllAvailable() finally q1.stop()
    val before = graft.sources.SnapshotStore.read(spark, dir).get.count()
    // same checkpoint, new query, no new data: nothing changes; then a
    // re-sent doc (same id, same text) must UPDATE its row, not append
    val q2 = start(in)
    try {
      q2.processAllAvailable()
      assert(graft.sources.SnapshotStore.read(spark, dir).get.count() === before)
      in.addData((1L, doc(1L, "alpha"), new Timestamp(base + 7200 * 1000L)))
      q2.processAllAvailable()
    } finally q2.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get
    assert(snap.count() === before, "a re-sent doc merges onto its own row")
    assert(snap.filter(col("doc_id") === 1L).count() === 1)
  }
}
