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

  test("multimodal decode stub: deterministic features of payload bytes") {
    val out = LlmEntry.queries("m1_multimodal")(spark, sfDir).cache()
    assert(out.count() > 0)
    import org.apache.spark.sql.functions._
    assert(out.filter(col("features").isNull).count() === 0)
    assert(out.filter(size(col("features")) =!= 4).count() === 0)
    // deterministic across runs
    val a = out.orderBy("asset_id").limit(1).collect()(0).getSeq[Double](4)
    val b = LlmEntry.queries("m1_multimodal")(spark, sfDir)
      .orderBy("asset_id").limit(1).collect()(0).getSeq[Double](4)
    assert(a === b)
  }
}
