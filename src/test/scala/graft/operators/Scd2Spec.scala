package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
  private val keys = Seq("k")
  private val tracked = Seq("v")

  private def apply1(cur: DataFrame, rows: Seq[(Long, String, Timestamp, Long)]) =
    Scd2.applyChanges(cur, rows.toDF("k", "v", "ts", "tie"),
      keys, tracked, "ts", Seq("tie"))

  test("hand case: open/close/chain across two batches with no-ops") {
    val b1 = Seq((1L, "F", ts("2024-01-01"), 1L), (1L, "P", ts("2024-01-03"), 2L),
      (2L, "F", ts("2024-01-02"), 3L))
    val init = Scd2.empty(b1.toDF("k", "v", "ts", "tie"), keys, tracked, "ts")
    val after1 = apply1(init, b1)
    // key 1: F[1,3) closed, P[3,∞) open; key 2: F[2,∞) open
    val a1 = after1.orderBy("k", "effective_from").collect()
    assert(a1.length === 3)
    assert(a1(0).getString(1) === "F" && !a1(0).getBoolean(4)
      && a1(0).getTimestamp(3) === ts("2024-01-03"))
    assert(a1(1).getString(1) === "P" && a1(1).getBoolean(4)
      && a1(1).getTimestamp(3) == null)

    // batch 2: key 1 no-op (P again) then F; key 2 pure no-op; key 3 new
    val b2 = Seq((1L, "P", ts("2024-01-05"), 4L), (1L, "F", ts("2024-01-07"), 5L),
      (2L, "F", ts("2024-01-06"), 6L), (3L, "X", ts("2024-01-04"), 7L))
    val a2 = apply1(after1, b2).orderBy("k", "effective_from").collect()
    val k1 = a2.filter(_.getLong(0) == 1L)
    // key 1: F[1,3), P[3,7), F[7,∞) — the P@5 no-op never splits P
    assert(k1.map(_.getString(1)).toSeq === Seq("F", "P", "F"))
    assert(k1(1).getTimestamp(3) === ts("2024-01-07"))
    assert(k1(2).getBoolean(4))
    // key 2 untouched open F; key 3 one open X
    val k2 = a2.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2(0).getBoolean(4) && k2(0).getTimestamp(3) == null)
    val k3 = a2.filter(_.getLong(0) == 3L)
    assert(k3.length === 1 && k3(0).getString(1) === "X" && k3(0).getBoolean(4))
  }

  test("intra-batch consecutive duplicates collapse; ties order by tie col") {
    val b = Seq((1L, "F", ts("2024-01-01"), 2L), (1L, "P", ts("2024-01-01"), 1L),
      (1L, "F", ts("2024-01-02"), 3L), (1L, "F", ts("2024-01-03"), 4L))
    val init = Scd2.empty(b.toDF("k", "v", "ts", "tie"), keys, tracked, "ts")
    val out = apply1(init, b).orderBy("effective_from", "is_current").collect()
    // order: P@(1,tie1), F@(1,tie2), F@2 collapses, F@3 collapses
    assert(out.map(_.getString(1)).toSeq === Seq("P", "F"))
    assert(out(1).getBoolean(4))
  }

  test("asOfJoin picks the version covering each fact date") {
    val b = Seq((1L, "F", ts("2024-01-01"), 1L), (1L, "P", ts("2024-01-03"), 2L))
    val dim = apply1(Scd2.empty(b.toDF("k", "v", "ts", "tie"), keys, tracked,
      "ts"), b)
    val facts = Seq(
      (10L, 1L, ts("2023-12-01")), // before first version -> NULL
      (11L, 1L, ts("2024-01-01")), // first instant of F
      (12L, 1L, ts("2024-01-02")), // inside F
      (13L, 1L, ts("2024-01-03")), // boundary: F closed, P opens
      (14L, 1L, ts("2024-05-01")), // deep in the open P version
      (15L, 9L, ts("2024-01-02"))  // unknown key -> NULL
    ).toDF("fid", "k", "fts")
    val out = Scd2.asOfJoin(facts, "fts", dim, keys, tracked)
      .orderBy("fid").collect()
    assert(out.map(r => Option(r.getAs[String]("dim_v")).orNull).toSeq ===
      Seq(null, "F", "F", "P", "P", null))
    // the carried effective_from is the matched version's start
    assert(out(3).getAs[Timestamp]("dim_effective_from") === ts("2024-01-03"))
    assert(out(0).getAs[Timestamp]("dim_effective_from") == null)
  }

  test("asOfJoin nulls retired versions and ignores zero-length ones") {
    // hand-built dim: key 1 retired (closed version, no successor);
    // key 2 has a zero-length A at t1 shadowed by the open B at t1
    val dim = Seq(
      (1L, "X", ts("2024-01-01"), ts("2024-01-03"), false),
      (2L, "A", ts("2024-01-01"), ts("2024-01-01"), false),
      (2L, "B", ts("2024-01-01"), null.asInstanceOf[Timestamp], true)
    ).toDF("k", "v", "effective_from", "effective_to", "is_current")
    val facts = Seq(
      (20L, 1L, ts("2024-01-02")), // inside the closed version -> X
      (21L, 1L, ts("2024-06-01")), // after retirement -> NULL, not stale X
      (22L, 2L, ts("2024-01-01"))  // zero-length A invisible -> B
    ).toDF("fid", "k", "fts")
    val out = Scd2.asOfJoin(facts, "fts", dim, keys, tracked)
      .orderBy("fid").collect()
    assert(out.map(r => Option(r.getAs[String]("dim_v")).orNull).toSeq ===
      Seq("X", null, "B"))
    assert(out(1).getAs[Timestamp]("dim_effective_from") == null &&
      out(1).getAs[Timestamp]("dim_effective_to") == null)
  }

  test("incremental two-batch build equals the one-shot build") {
    val ch = table("orders").filter(col("o_custkey") < 50)
      .select(col("o_custkey").as("k"), col("o_orderstatus").as("v"),
        col("o_orderdate").as("ts"), col("o_orderkey").as("tie"))
    val init = Scd2.empty(ch, keys, tracked, "ts")
    val cut = lit("1998-01-01").cast("timestamp")
    val oneShot = Scd2.applyChanges(init, ch, keys, tracked, "ts", Seq("tie"))
    val twoStep = Scd2.applyChanges(
      Scd2.applyChanges(init, ch.filter(col("ts") < cut), keys, tracked,
        "ts", Seq("tie")),
      ch.filter(col("ts") >= cut), keys, tracked, "ts", Seq("tie"))
    assert(oneShot.count() > 0)
    assert(oneShot.exceptAll(twoStep).count() === 0L)
    assert(twoStep.exceptAll(oneShot).count() === 0L)
  }
}
