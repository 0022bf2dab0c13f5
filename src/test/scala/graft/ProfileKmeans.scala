package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scratch timing for the k-means family (e4/e3b) at a given sf. */
object ProfileKmeans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleBytes += te.taskMetrics.shuffleWriteMetrics.bytesWritten
    })
    // big synthetic corpus: 200k x 64 dims, deterministic values
    import org.apache.spark.sql.functions._
    val big = spark.range(200000).toDF("vec_id")
      .withColumn("embedding", expr(
        "transform(sequence(0, 63), d -> cast(pmod(vec_id * 2654435761 + d * 40503, 997) as float) / 997.0)"))
      .repartition(32) // round-robin, like Tables.spread on a real load
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      val b0 = shuffleBytes
      val t0 = System.nanoTime()
      val n = graft.ann.KMeans.lloyd(big, k = 8, iters = 2).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"BIG lloyd pass$i: $dt%.3f s rows=$n shuffleMB=${(shuffleBytes - b0) / 1e6}%.1f")
    }
    Seq("e4_kmeans", "e3b_knn_ivf_trained").foreach { q =>
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val b0 = shuffleBytes
        val t0 = System.nanoTime()
        val n = LlmEntry.queries(q)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener drain
        println(f"$q pass$i: $dt%.3f s rows=$n shuffleMB=${(shuffleBytes - b0) / 1e6}%.1f")
      }
    }
    spark.stop()
  }
}
