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

  test("one pipeline, two value sets: environments differ by config only") {
    import org.apache.spark.sql.functions.col
    import graft.operators.VariableLibrary
    // the VL_claims shape: Medallion.Variables declares the defaults;
    // Dev/Prod override work_dir + pii_salt (and Prod tightens the DQ
    // status domain) — the PIPELINE CODE is byte-identical across envs
    val devDir = java.nio.file.Files.createTempDirectory("graft-med-dev").toString
    val prodDir = java.nio.file.Files.createTempDirectory("graft-med-prod").toString
    val lib = VariableLibrary(
      variables = Medallion.Variables.variables + ("source_dir" -> sfDir),
      valueSets = Map(
        "Dev" -> Map("work_dir" -> devDir, "pii_salt" -> "dev_salt"),
        "Prod" -> Map("work_dir" -> prodDir, "pii_salt" -> "prod_salt",
          "valid_statuses" -> "F,O")))
    val mDev = Medallion.run(spark, lib.resolve("Dev"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mProd = Medallion.run(spark, lib.resolve("Prod"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // same feed slice; Prod's tighter status domain quarantines MORE
    assert(mDev("fresh_rows") === mProd("fresh_rows"))
    assert(mProd("quarantined_rows") > mDev("quarantined_rows"))
    // each env wrote its own isolated stores
    Seq(devDir, prodDir).foreach { d =>
      assert(SnapshotStore.read(spark, s"$d/fact").isDefined, d)
    }
    // different salts pseudonymize to disjoint keys for the same facts
    val kDev = SnapshotStore.read(spark, s"$devDir/fact").get
      .select("patient_key").collect().map(_.getString(0)).toSet
    val kProd = SnapshotStore.read(spark, s"$prodDir/fact").get
      .select("patient_key").collect().map(_.getString(0)).toSet
    assert(kDev.intersect(kProd).isEmpty, "salts must not collide")
    // misconfigurations fail fast at construction/resolution
    intercept[IllegalArgumentException] {
      VariableLibrary(Map("a" -> "1"), Map("X" -> Map("typo" -> "2")))
    }
    intercept[NoSuchElementException] { lib.resolve("Staging") }
    intercept[NoSuchElementException] { lib.resolve("Dev")("undeclared") }
    // runResilient consumes the same resolved sets (fresh dir so the
    // watermark written above doesn't empty the slice)
    val devDir2 = java.nio.file.Files.createTempDirectory("graft-med-dev2").toString
    val lib2 = VariableLibrary(
      variables = Medallion.Variables.variables +
        ("source_dir" -> sfDir) + ("work_dir" -> devDir2) +
        ("pii_salt" -> "dev_salt"))
    val log = Medallion.runResilient(spark, lib2.default, "env-r1")
      .filter(col("status") =!= "succeeded").count()
    assert(log === 0L)
    val kDev2 = SnapshotStore.read(spark, s"$devDir2/fact").get
      .select("patient_key").collect().map(_.getString(0)).toSet
    assert(kDev2 === kDev, "same value set => same pseudonymized keys")
  }

  test("variable library loads the reference's JSON wire shape") {
    import graft.operators.VariableLibrary
    val lib = VariableLibrary.fromJson(
      """{"variables": [
        |  {"name": "work_dir", "type": "String", "value": "/data/dev"},
        |  {"name": "max_attempts", "type": "Integer", "value": 2},
        |  {"name": "strict", "type": "Boolean", "value": false}
        |]}""".stripMargin,
      Seq("""{"name": "Prod", "variableOverrides": [
            |  {"name": "work_dir", "value": "/data/prod"},
            |  {"name": "strict", "value": true}
            |]}""".stripMargin))
    // non-string JSON scalars flatten to text; typed accessors
    // re-interpret at use
    val dev = lib.default
    assert(dev("work_dir") === "/data/dev")
    assert(dev.int("max_attempts") === 2)
    assert(!dev.bool("strict"))
    val prod = lib.resolve("Prod")
    assert(prod("work_dir") === "/data/prod")
    assert(prod.bool("strict"))
    assert(prod.int("max_attempts") === 2, "non-overridden keeps default")
    // an override of an undeclared variable fails at LOAD
    intercept[IllegalArgumentException] {
      VariableLibrary.fromJson(
        """{"variables": [{"name": "a", "value": "1"}]}""",
        Seq("""{"name": "X", "variableOverrides": [{"name": "typo", "value": "2"}]}"""))
    }
    // malformed shapes fail fast with a pointer at the file
    intercept[IllegalArgumentException] {
      VariableLibrary.fromJson("""{"notvariables": []}""")
    }
    intercept[IllegalArgumentException] {
      VariableLibrary.fromJson(
        """{"variables": [{"name": "a"}]}""") // value missing
    }
    // a non-scalar value must fail at LOAD, not flatten to "" (Jackson
    // asText on object/array nodes returns empty string)
    intercept[IllegalArgumentException] {
      VariableLibrary.fromJson(
        """{"variables": [{"name": "a", "value": {"nested": 1}}]}""")
    }
    intercept[IllegalArgumentException] {
      VariableLibrary.fromJson(
        """{"variables": [{"name": "a", "value": [1, 2]}]}""")
    }
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
