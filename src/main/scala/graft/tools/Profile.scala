package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only query timer (not part of the driver contract).
  * Usage: runMain graft.tools.Profile <sfDir> <queryKey>...
  * Each key runs in order (repeat a key to see warm timings).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys = if (args.length > 1) args.toSeq.tail
               else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .appName("graft-profile").master("local[32]")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CLEARCACHE=1 mimics Bench: caches cleared before each
    // run, so repeated keys measure steady-state WITHOUT cross-run
    // cache reuse (operator-internal caches rebuild in-run).
    val clear = sys.env.get("SPARK_GRAFT_CLEARCACHE").contains("1")
    for (k <- keys) {
      if (clear) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(k)(spark, dir).count()
      println(f"[profile] $k%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
