package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{DupClusters, TextDedup}
import graft.sources.SnapshotStore

/** Scratch profiling main for ClusterStream's per-batch cost (not
  * shipped; test scope): replays the exact foreachBatch steps on
  * StreamBench's synthetic corpus, batch by batch, timing each stage
  * and counting Spark jobs. */
object ProfileClusterStream {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val chunk = sys.env.getOrElse("STREAM_CHUNK", "5000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })
    def timed[A](label: String)(f: => A): A = {
      val j0 = jobs; val t0 = System.nanoTime()
      val r = f
      println(f"[profile]   $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs jobs=${jobs - j0}")
      r
    }

    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val idxDir = tmp("graft-pcs-idx")
    val clDir = tmp("graft-pcs-cl")

    def mkBatch(off: Int, m: Int): DataFrame =
      (off until off + m).map { i =>
        val k = if (i % 5 == 4) i - 1
          else if (i % 31 == 30 && i >= chunk) i - chunk
          else i
        (i.toLong, (0 until 12).map(j => s"t${j}v${k * 31 + j * 7919}")
          .mkString(" "))
      }.toDF("doc_id", "text")

    var off = 0
    while (off < n) {
      val m = math.min(chunk, n - off)
      println(s"[profile] === batch off=$off m=$m ===")
      val b = mkBatch(off, m).persist()
      b.count(): Unit
      val pairCols: DataFrame => DataFrame = _.select("doc_a", "doc_b")
      val cross = timed("cross pairs") {
        if (SnapshotStore.read(spark, idxDir).isDefined)
          pairCols(TextDedup.minHashLshPairsAgainstIndex(spark, idxDir,
            b, col("doc_id"), col("text"), 0.1)).persist()
            .tap(_.count(): Unit)
        else Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      }
      val within = timed("within pairs") {
        pairCols(TextDedup.minHashLshPairs(b, col("doc_id"),
          col("text"), 0.1)).persist().tap(_.count(): Unit)
      }
      val pairs = cross.unionByName(within)
      val stored = SnapshotStore.read(spark, clDir)
        .map(_.select("doc_id", "cluster_id"))
        .getOrElse(Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"))
      timed("contracted CC rounds") {
        val lbl = stored.select(col("doc_id").cast("long").as("node"),
          col("cluster_id").cast("long").as("lbl"))
        val edges = pairs.select(col("doc_a").cast("long").as("src"),
          col("doc_b").cast("long").as("dst"))
        val contracted = edges
          .join(lbl.select(col("node").as("src"), col("lbl").as("slbl")),
            Seq("src"), "left")
          .join(lbl.select(col("node").as("dst"), col("lbl").as("dlbl")),
            Seq("dst"), "left")
          .select(coalesce(col("slbl"), col("src")).as("doc_a"),
            coalesce(col("dlbl"), col("dst")).as("doc_b"))
          .filter(col("doc_a") =!= col("doc_b"))
          .distinct()
        val (_, rounds) = DupClusters.connectedComponentsWithRounds(contracted)
        println(s"[profile]     cc rounds=$rounds contracted=${contracted.count()}")
      }
      val merged = timed("mergeComponents") {
        DupClusters.mergeComponents(stored, pairs).persist()
          .tap(_.count(): Unit)
      }
      timed("delta + mergeInto") {
        val delta = merged
          .join(stored.withColumnRenamed("cluster_id", "__prev"),
            Seq("doc_id"), "left")
          .filter(col("__prev").isNull || col("__prev") =!= col("cluster_id"))
          .select("doc_id", "cluster_id")
        SnapshotStore.mergeInto(delta, clDir, Seq("doc_id")): Unit
      }
      timed("updateDedupIndex") {
        TextDedup.updateDedupIndex(b, col("doc_id"), col("text"), idxDir): Unit
      }
      merged.unpersist(); b.unpersist()
      cross.unpersist(); within.unpersist()
      off += m
    }
    spark.stop()
  }

  private implicit class Tap[A](private val a: A) extends AnyVal {
    def tap(f: A => Unit): A = { f(a); a }
  }
}
