package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.TextDedup
import graft.sources.Tables

/** Scratch profiling main for the d2b cost question (not shipped; test
  * scope). Times d2 vs d2b at a given sf and counts Spark jobs. */
object ProfileD2b {
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

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })

    def docs = Tables.load(spark, sfDir, "documents")

    // hot-set size at cap=10
    val ex = docs.select(col("doc_id"),
      explode(TextDedup.shingles(col("text"))).as("s"))
    val hot = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > 10)
    println(s"HOTSET size=${hot.count()} max_df=" +
      hot.agg(max("df")).collect()(0).get(0))
    println("total distinct shingles=" + ex.select("s").distinct().count())

    def time(name: String, f: => Long): Unit = {
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val j0 = jobs
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name pass$i: $dt%.3f s, jobs=${jobs - j0}, rows=$n")
      }
    }

    time("d2 ", TextDedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      0.05, None).count())
    time("d2b", TextDedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      0.05, Some(10)).count())

    spark.stop()
  }
}
