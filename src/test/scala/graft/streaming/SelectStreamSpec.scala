package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Dsir

/** SelectStream: the frozen DSIR importance model served over a
  * stream — threshold routing (select / drop / no-evidence review),
  * equality with the batch scorer, threshold calibration from the
  * batch draw, and checkpoint-restart idempotence of the MERGE
  * sink. */
class SelectStreamSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // DsirSpec's fixture: target is alpha-heavy, the pool has one
  // alpha-ish doc, one gamma doc, one empty doc
  private lazy val target = Seq((100L, "alpha alpha beta"), (101L, "alpha"))
    .toDF("doc_id", "text")
  private lazy val pool = Seq((1L, "alpha beta"), (2L, "gamma gamma"), (3L, ""))
    .toDF("doc_id", "text")
  private lazy val m =
    Dsir.model(target, pool, col("text"), buckets = B).persist()

  test("routing: select at/above the threshold, drop below, review on no evidence") {
    implicit val sqlCtx = spark.sqlContext
    // batch truth: the target-like doc outscores the gamma doc
    val w = Dsir.score(pool, col("doc_id"), col("text"), m, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L), "the target-like doc must score higher")
    assert(!w.contains(3L), "a no-feature doc has no weight row")
    // threshold calibrated BETWEEN the two weights: 1 selects, 2 drops
    val cut = (w(1L) + w(2L)) / 2
    val dir = java.nio.file.Files.createTempDirectory("graft-sel-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sel-ckpt").toString
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "alpha beta"), (2L, "gamma gamma"), (3L, ""))
    val q = SelectStream.run(input.toDF().toDF("doc_id", "text"),
      col("doc_id"), col("text"), m, dir, ckpt, minWeight = cut, buckets = B)
    try q.processAllAvailable() finally q.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get
    val routes = snap.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("route")).toMap
    assert(routes === Map(1L -> "select", 2L -> "drop", 3L -> "review"))
    assert(snap.filter(col("doc_id") === 3L && col("weight").isNull)
      .count() === 1, "the no-evidence doc survives with a null weight")
    // the stream's routed rows ARE the batch replay on the same docs
    val streamed = snap.select("doc_id", "n_feats", "weight", "route")
      .collect().map(_.toSeq).toSet
    val batch = SelectStream.routeBatch(pool, m, cut, buckets = B)
      .select("doc_id", "n_feats", "weight", "route")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("in-batch redelivery: a doc delivered twice in one batch scores once") {
    val once = SelectStream.routeBatch(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), m, 0.0, buckets = B)
      .select("doc_id", "n_feats", "weight", "route")
    val twice = SelectStream.routeBatch(
      Seq((1L, "alpha beta"), (1L, "alpha beta")).toDF("doc_id", "text"),
      m, 0.0, buckets = B)
      .select("doc_id", "n_feats", "weight", "route")
    assert(twice.count() === 1, "one routed row per doc_id per batch")
    assert(twice.collect().map(_.toSeq).toSet ===
      once.collect().map(_.toSeq).toSet,
      "a redelivered doc must weigh as if delivered once")
  }

  test("threshold calibration from the batch draw: the k-th weight reproduces top-k") {
    // the documented serving contract: take the batch Gumbel draw's
    // selected docs... but threshold on WEIGHT must reproduce a
    // weight-ranked (not Gumbel-jittered) cut, so calibrate from
    // ranked weights directly
    val ws = Dsir.score(pool, col("doc_id"), col("text"), m, buckets = B)
      .orderBy(col("weight").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val cut = ws(0)._2 // k = 1: the top weight is the threshold
    val routed = SelectStream.routeBatch(pool, m, cut, buckets = B)
      .filter(col("route") === "select").collect().map(_.getLong(0)).toSeq
    assert(routed === Seq(ws(0)._1),
      "threshold = k-th ranked weight must select exactly the top k")
  }

  test("checkpoint restart: MERGE stays idempotent, updates not duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sel2-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sel2-ckpt").toString
    def start(in: MemoryStream[(Long, String)]) =
      SelectStream.run(in.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), m, dir, ckpt, minWeight = 0.0, buckets = B)
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "alpha beta"), (2L, "gamma gamma"))
    val q1 = start(in)
    try q1.processAllAvailable() finally q1.stop()
    // restart; doc 2 re-arrives with NEW target-like text, doc 5 is new
    in.addData((2L, "alpha alpha"), (5L, "gamma"))
    val q2 = start(in)
    try q2.processAllAvailable() finally q2.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get
    assert(snap.count() === 3, "one row per doc_id after the re-send")
    val routes = snap.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("route")).toMap
    assert(routes(1L) === "select" && routes(5L) === "drop")
    assert(routes(2L) === "select",
      "the re-sent doc's routing must reflect its NEW text")
  }
}
