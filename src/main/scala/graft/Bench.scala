package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max, md5}

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Times are steady-state: each query runs twice untimed (JVM/JIT +
  * Janino codegen warmup — one-time costs a long-running engine never
  * repays; one pass measurably wasn't enough, see the warmup comment
  * below), then min over three timed passes. A fixed CANARY job — a
  * code-independent 32-way md5 scan — is timed inside every pass and
  * reported per pass, so a round-over-round delta can be attributed:
  * if the canary moved with the queries, the host moved, not the code
  * (measured r2: the same binary's total drifted 36s→70s over a day
  * of host contention while per-query plans were unchanged).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // same session shape as Verify: graft extensions registered once
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 8000000L, 1L, cpus.toInt)
        .select(md5(col("id").cast("string")).as("h"))
        .agg(max("h")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def once(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // TWO untimed warmup passes: r4 measured the first TIMED canary at
    // 7x the others (3.08s vs 0.44s) — one pass leaves JIT/codegen
    // warmup bleeding into the first timed pass, which polluted
    // early-benched queries (x1's 2.4x r4 "regression" was exactly
    // this; see BENCH notes). The second pass costs ~1 bench-total but
    // makes all three timed canaries commensurate, so round-over-round
    // deltas are attributable.
    once(); canary()
    once(); canary()
    // two extra canary-only warmups: the canary path itself JITs later
    // than the queries (it first runs after a full query pass), and r5's
    // official run still showed the first TIMED canary at 1.5x the
    // other two (1.136 vs 0.727/0.737) — which poisons the canary-min
    // host-noise reference. ~1s total cost.
    canary(); canary(): Unit
    // drop operator-internal .cache() data so timed passes recompute
    // everything — only JIT/codegen warmth carries over, not results.
    // Three interleaved timed passes, per-query min: single-JVM runs
    // jitter by whole seconds (GC, compile threads) and min-of-n is
    // the standard steady-state estimator.
    val passes = Seq.fill(3) {
      spark.catalog.clearCache()
      (once(), canary())
    }
    val results = passes.map(_._1).flatten.groupMapReduce(_._1)(_._2)(math.min)
    val canaries = passes.map(_._2)
    // ms precision + short field set: the driver captures a bounded
    // tail of stdout, and r3's full-precision doubles (~18 chars each
    // over 64 queries) pushed the line past the window, truncating 8
    // queries and the total. total/canary also repeat AFTER the query
    // map so they survive truncation from either end.
    def f3(v: Double): String = f"$v%.3f"
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val cs = canaries.map(f3).mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","canary_sec":$cs,"canary_min":${f3(canaries.min)},"methodology":"2 warmup passes + 2 canary-only warmups; min over 3 interleaved timed passes, caches cleared between; canary = fixed ${cpus}-way md5 scan per pass (host-noise ref)","queries":$qs,"total":${f3(total)},"canary":${f3(canaries.min)}}"""
    println(json)
    // ALSO persist the complete record to a committed file: the driver
    // keeps only a bounded stdout tail, which in r5 truncated 36 of 118
    // per-query numbers out of the official artifact. The file is the
    // durable copy; stdout stays the driver contract.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: $e") }
    spark.stop()
  }
}
