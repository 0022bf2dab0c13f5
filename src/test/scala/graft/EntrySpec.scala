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
