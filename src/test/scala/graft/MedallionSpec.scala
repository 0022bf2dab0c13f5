package graft

import graft.sources.{SnapshotStore, Watermark}

/** End-to-end pipeline: two runs, the second incremental via the
  * watermark (no new data → stores unchanged, zero fresh rows). */
class MedallionSpec extends SparkSpec {

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
