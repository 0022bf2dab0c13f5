package graft

import graft.sources.{SnapshotStore, Watermark}

/** End-to-end pipeline: two runs, the second incremental via the
  * watermark (no new data → stores unchanged, zero fresh rows). */
class MedallionSpec extends SparkSpec {

  test("runResilient converges to run's exact end state, watermark last") {
    import org.apache.spark.sql.functions.col
    val wA = java.nio.file.Files.createTempDirectory("graft-med-run").toString
    val wB = java.nio.file.Files.createTempDirectory("graft-med-res").toString
    Medallion.run(spark, sfDir, wA)
    val log = Medallion.runResilient(spark, sfDir, wB, "r1")
      .orderBy("stage_no").collect()
      .map(r => (r.getString(2), r.getString(3)))
    assert(log.toSeq === Seq("bronze" -> "succeeded", "silver" -> "succeeded",
      "gold" -> "succeeded", "advance_watermark" -> "succeeded"))
    // end-state parity: every store and the watermark agree with run()
    // (this is also the drift guard between the two forms)
    Seq("bronze", "fact", "gold").foreach { s =>
      val a = SnapshotStore.read(spark, s"$wA/$s").get
        .collect().map(_.toString).sorted
      val b = SnapshotStore.read(spark, s"$wB/$s").get
        .collect().map(_.toString).sorted
      assert(a.sameElements(b), s"store $s diverged between run forms")
    }
    assert(Watermark.read(s"$wA/watermark.json") ===
      Watermark.read(s"$wB/watermark.json"))
    // replay (empty increment): stores stable, watermark untouched,
    // every stage still succeeds — the idempotence the retry posture
    // rests on
    val g1 = SnapshotStore.read(spark, s"$wB/gold").get
      .collect().map(_.toString).sorted
    val log2 = Medallion.runResilient(spark, sfDir, wB, "r2")
      .filter(col("status") =!= "succeeded").count()
    assert(log2 === 0L)
    val g2 = SnapshotStore.read(spark, s"$wB/gold").get
      .collect().map(_.toString).sorted
    assert(g1.sameElements(g2), "replay changed the gold state")
  }

  test("full run then incremental no-op run") {
    val work = java.nio.file.Files.createTempDirectory("graft-medallion").toString
    val m1 = Medallion.run(spark, sfDir, work)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1("fresh_rows") > 0)
    assert(m1("clean_rows") + m1("quarantined_rows") <= m1("fresh_rows"))
    assert(m1("fact_rows") > 0 && m1("gold_rows") > 0)
    val factV1 = SnapshotStore.currentVersion(s"$work/fact").get
    val wm1 = Watermark.read(s"$work/watermark.json")

    // second run: watermark filters everything out; stores advance a
    // version (same content merged) but row counts are stable
    val m2 = Medallion.run(spark, sfDir, work)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m2("fresh_rows") === 0)
    assert(m2("fact_rows") === m1("fact_rows"))
    assert(Watermark.read(s"$work/watermark.json") === wm1)
    assert(SnapshotStore.currentVersion(s"$work/fact").get > factV1)
  }
}
