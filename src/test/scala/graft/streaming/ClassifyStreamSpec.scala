package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.NaiveBayes

/** ClassifyStream: the frozen NB model served over a stream — routing
  * semantics (pred / low-margin / no-evidence), equality with the
  * batch replay, and checkpoint-restart idempotence of the MERGE
  * sink. */
class ClassifyStreamSpec extends SparkSpec {
  import spark.implicits._

  // symmetric 2-label corpus: equal priors, equal masses, |V| = 4 —
  // "fine spam" scores identically under both labels (margin exactly
  // 0, the engineered low-margin case)
  private lazy val train = Seq(
    (10L, "good", "fine nice"), (11L, "bad", "spam junk"))
    .toDF("doc_id", "label", "text")
  private lazy val m =
    NaiveBayes.model(train, col("text"), col("label")).persist()
  private lazy val pri = NaiveBayes.priors(train, col("label")).persist()

  test("routing: pred above the margin gate, review for ties and OOV") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cls-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cls-ckpt").toString
    val input = MemoryStream[(Long, String)]
    input.addData(
      (1L, "fine nice fine"),   // clearly good
      (2L, "spam junk junk"),   // clearly bad
      (3L, "qq ww"),            // all OOV -> no evidence -> review
      (4L, "fine spam"))        // symmetric -> margin 0 -> review
    val q = ClassifyStream.run(input.toDF().toDF("doc_id", "text"),
      col("doc_id"), col("text"), m, pri, dir, ckpt, minMargin = 0.1)
    try q.processAllAvailable() finally q.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get
    val routes = snap.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("route")).toMap
    assert(routes === Map(1L -> "good", 2L -> "bad",
      3L -> "review", 4L -> "review"))
    assert(snap.filter(col("doc_id") === 3L && col("pred").isNull).count() === 1,
      "the OOV doc must survive with a null pred, not be dropped")
    // the stream's routed rows ARE the batch replay on the same docs
    val streamed = snap
      .select("doc_id", "pred", "score", "margin", "route")
      .collect().map(_.toSeq).toSet
    val batch = ClassifyStream.routeBatch(
        Seq((1L, "fine nice fine"), (2L, "spam junk junk"),
          (3L, "qq ww"), (4L, "fine spam")).toDF("doc_id", "text"),
        m, pri, minMargin = 0.1)
      .select("doc_id", "pred", "score", "margin", "route")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("in-batch redelivery: a doc delivered twice in one batch scores once") {
    // pre-fix, the doubled rows exploded tokens twice — doubling the
    // per-(doc, label) token sums (wrong score/margin vs priors
    // counted once) and committing duplicate doc_id rows via MERGE
    val once = ClassifyStream.routeBatch(
      Seq((1L, "fine nice fine")).toDF("doc_id", "text"),
      m, pri, minMargin = 0.1).select("doc_id", "pred", "score", "margin", "route")
    val twice = ClassifyStream.routeBatch(
      Seq((1L, "fine nice fine"), (1L, "fine nice fine"))
        .toDF("doc_id", "text"),
      m, pri, minMargin = 0.1).select("doc_id", "pred", "score", "margin", "route")
    assert(twice.count() === 1, "one routed row per doc_id per batch")
    assert(twice.collect().map(_.toSeq).toSet ===
      once.collect().map(_.toSeq).toSet,
      "a redelivered doc must score as if delivered once")
    // conflicting texts for one doc_id: the survivor is deterministic
    val conflict = ClassifyStream.routeBatch(
      Seq((1L, "fine nice"), (1L, "spam junk junk")).toDF("doc_id", "text"),
      m, pri, minMargin = 0.1).select("doc_id", "route").collect()
    assert(conflict.length === 1 && conflict(0).getString(1) === "bad",
      "max(text) survivor: 'spam junk junk' > 'fine nice'")
  }

  test("checkpoint restart: MERGE stays idempotent, updates not duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cls2-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cls2-ckpt").toString
    def start(in: MemoryStream[(Long, String)]) =
      ClassifyStream.run(in.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), m, pri, dir, ckpt, minMargin = 0.1)
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "fine nice"), (2L, "spam junk"))
    val q1 = start(in)
    try q1.processAllAvailable() finally q1.stop()
    // same source, same checkpoint, new query = restart; doc 1
    // re-arrives with NEW text (label flips), doc 5 is new
    in.addData((1L, "spam spam junk"), (5L, "nice nice"))
    val q2 = start(in)
    try q2.processAllAvailable() finally q2.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get
    assert(snap.count() === 3, "one row per doc_id after the re-send")
    val routes = snap.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("route")).toMap
    assert(routes === Map(1L -> "bad", 2L -> "bad", 5L -> "good"),
      "the re-sent doc's routing must reflect its NEW text")
  }
}
