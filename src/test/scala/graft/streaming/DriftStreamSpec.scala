package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextAnalysis

/** DriftStream: per-micro-batch KL drift against a frozen reference
  * profile — batch == stream parity, drift ordering, and the
  * batch-keyed MERGE's replay safety. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  private lazy val healthy = Seq(
    (1L, "alpha beta alpha gamma"), (2L, "alpha beta beta"))
    .toDF("doc_id", "text")
  private lazy val ref =
    TextAnalysis.unigramProfile(healthy, col("text"), buckets = B).persist()

  test("matched batches read low, drifted batches read high; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift-ckpt").toString
    val in = MemoryStream[String]
    val q = DriftStream.run(in.toDF().toDF("text"), col("text"), ref,
      dir, ckpt, buckets = B)
    try {
      in.addData("alpha beta alpha gamma", "alpha beta beta") // batch 0: the reference itself
      q.processAllAvailable()
      in.addData("zulu zulu xray xray zulu") // batch 1: disjoint vocabulary
      q.processAllAvailable()
    } finally q.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get
      .orderBy("batch_id").collect()
    assert(snap.length === 2, "one audit row per micro-batch")
    val (klSame, klDrift) = (snap(0).getAs[Double]("kl_bits"),
      snap(1).getAs[Double]("kl_bits"))
    assert(klSame == 0.0,
      s"a batch identical to the reference must read 0 bits, got $klSame")
    assert(klDrift > klSame + 0.1,
      s"a disjoint batch must read clearly higher: $klDrift vs $klSame")
    // the stream rows ARE the batch function on the same data
    val direct = TextAnalysis.klDrift(healthy, col("text"), ref, buckets = B)
      .collect()(0)
    assert(snap(0).getAs[Long]("n_tokens") === direct.getAs[Long]("n_tokens"))
    assert(klSame === direct.getAs[Double]("kl_bits"))
  }

  test("a zero-token batch records no audit row (a feed lull is not drift)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-drift0-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift0-ckpt").toString
    val in = MemoryStream[String]
    val q = DriftStream.run(in.toDF().toDF("text"), col("text"), ref,
      dir, ckpt, buckets = B)
    try {
      in.addData("", "   ") // batch 0: tokenizes to nothing
      q.processAllAvailable()
      in.addData("alpha beta") // batch 1: real evidence
      q.processAllAvailable()
    } finally q.stop()
    val snap = graft.sources.SnapshotStore.read(spark, dir).get.collect()
    assert(snap.length === 1,
      s"the empty batch must record nothing (add-one smoothing would read " +
        s"it as maximal drift); got ${snap.length} rows")
    assert(snap(0).getAs[Long]("batch_id") === 1L)
    assert(snap(0).getAs[Long]("n_tokens") === 2L)
  }

  test("checkpoint restart: a replayed batch overwrites its own row") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-drift2-snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift2-ckpt").toString
    def start(in: MemoryStream[String]) =
      DriftStream.run(in.toDF().toDF("text"), col("text"), ref,
        dir, ckpt, buckets = B)
    val in = MemoryStream[String]
    in.addData("alpha beta")
    val q1 = start(in)
    try q1.processAllAvailable() finally q1.stop()
    // same checkpoint, new query: no new data -> no new rows, and the
    // recorded series is unchanged (compare by field name — the MERGE
    // store may reorder columns across versions)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("batch_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("kl_bits"))).toSet
    val before = rows(graft.sources.SnapshotStore.read(spark, dir).get)
    val q2 = start(in)
    try {
      q2.processAllAvailable()
      in.addData("gamma gamma")
      q2.processAllAvailable()
    } finally q2.stop()
    val after = rows(graft.sources.SnapshotStore.read(spark, dir).get)
    assert(after.size === 2, "exactly one row per delivered batch")
    assert(after.intersect(before) === before,
      s"replay must not rewrite history; after=$after before=$before")
  }
}
