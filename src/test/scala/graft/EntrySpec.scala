package graft

import graft.SparkSpec

class EntrySpec extends SparkSpec {
  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; every query runs on sf0.001") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle keys without query: ${ok -- qk}")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, name)
      // every query materializes without error (row counts may be 0 at
      // this tiny scale for threshold-based pair queries)
      df.count()
    }
  }

  test("g8 emits all four buckets with zero counts on a no-dup slice") {
    // Guards the oracle-divergence class ADVICE flagged: the stack(4,…)
    // form must emit zero buckets explicitly (and the DuckDB oracle's
    // VALUES LEFT JOIN form mirrors it), so a corpus with no duplicates
    // still yields 4 rows, not 3.
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-g8-slice").toString
    table("lineitem").dropDuplicates("l_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = SparkEntry.queries("g8_ingestion_log")(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet ==
      Set("duplicate", "bad_quality", "clean", "malformed"))
    assert(out("duplicate") === 0L)
    assert(out("malformed") === 0L)
    assert(out("bad_quality") + out("clean") > 0L)
  }

  test("multimodal decode stub: deterministic features of payload bytes") {
    val out = LlmEntry.queries("m1_multimodal")(spark, sfDir).cache()
    assert(out.count() > 0)
    import org.apache.spark.sql.functions._
    val fCols = Seq("f0", "f1", "f2", "f3")
    fCols.foreach(c => assert(out.filter(col(c).isNull).count() === 0, c))
    // deterministic across runs
    def firstFeats(df: org.apache.spark.sql.DataFrame): Seq[Double] = {
      val r = df.orderBy("asset_id").limit(1).collect()(0)
      fCols.map(c => r.getDouble(r.fieldIndex(c)))
    }
    assert(firstFeats(out) === firstFeats(LlmEntry.queries("m1_multimodal")(spark, sfDir)))
  }
}
