package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.NaiveBayes

/** NbModelStream: additive sufficient statistics make streamed NB
  * training bit-identical to the batch fit — two-batch equality,
  * restart replay safety, compaction, and the full
  * maintain → serve loop with ClassifyStream. */
class NbModelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private val batch1 = Seq(
    (1L, "a", "x x y"), (2L, "a", "x"), (3L, "b", "z z"))
  private val batch2 = Seq(
    (4L, "b", "z w"), (5L, "a", "y y"))
  private def union: DataFrame =
    (batch1 ++ batch2).toDF("doc_id", "label", "text")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("two streamed batches == one batch fit; restart is replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val (tokDir, docDir, ckpt) =
      (tmp("graft-nbm-tok"), tmp("graft-nbm-doc"), tmp("graft-nbm-ckpt"))
    def start(in: MemoryStream[(Long, String, String)]) =
      NbModelStream.run(in.toDF().toDF("doc_id", "label", "text"),
        col("text"), col("label"), tokDir, docDir, ckpt)
    val in = MemoryStream[(Long, String, String)]
    in.addData(batch1)
    val q1 = start(in)
    try q1.processAllAvailable() finally q1.stop()
    // restart from the checkpoint, feed the second batch
    in.addData(batch2)
    val q2 = start(in)
    try q2.processAllAvailable() finally q2.stop()
    val streamed = NbModelStream.readModel(spark, tokDir).get
    val batch = NaiveBayes.model(union, col("text"), col("label"))
    assert(sortedRows(streamed) === sortedRows(batch),
      "folded registers must reproduce the batch model bit for bit")
    assert(sortedRows(NbModelStream.readPriors(spark, docDir).get) ===
      sortedRows(NaiveBayes.priors(union, col("label"))))
  }

  test("compaction preserves the model; maintained model serves ClassifyStream") {
    implicit val sqlCtx = spark.sqlContext
    val (tokDir, docDir, ckpt) =
      (tmp("graft-nbm2-tok"), tmp("graft-nbm2-doc"), tmp("graft-nbm2-ckpt"))
    def start(in: MemoryStream[(Long, String, String)]) =
      NbModelStream.run(in.toDF().toDF("doc_id", "label", "text"),
        col("text"), col("label"), tokDir, docDir, ckpt)
    val in = MemoryStream[(Long, String, String)]
    in.addData(batch1)
    val q1 = start(in)
    try q1.processAllAvailable() finally q1.stop()
    NbModelStream.compact(spark, tokDir, docDir)
    in.addData(batch2)
    val q2 = start(in)
    try q2.processAllAvailable() finally q2.stop()
    NbModelStream.compact(spark, tokDir, docDir)
    val m = NbModelStream.readModel(spark, tokDir).get
    assert(sortedRows(m) ===
      sortedRows(NaiveBayes.model(union, col("text"), col("label"))),
      "compaction must not change the folded statistics")
    // the register stores stay bounded: base row per group + the
    // newest batch's keyed rows
    val tokState = graft.sources.SnapshotStore.read(spark, tokDir).get
    assert(tokState.select("batch_id").distinct().count() <= 2)
    // serve the maintained model: routing equals a batch-trained model
    val pri = NbModelStream.readPriors(spark, docDir).get
    val docs = Seq((9L, "x y"), (10L, "z z")).toDF("doc_id", "text")
    val served = ClassifyStream.routeBatch(docs, m, pri, minMargin = 0.0)
      .select("doc_id", "route").as[(Long, String)].collect().toMap
    assert(served === Map(9L -> "a", 10L -> "b"))
  }
}
