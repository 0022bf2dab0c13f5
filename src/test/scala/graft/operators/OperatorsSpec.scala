package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  test("latestByKey keeps exactly one row per key, the ordered winner") {
    val li = table("lineitem")
    val out = Dedup.latestByKey(li, Seq("l_orderkey"),
      Seq(col("l_shipdate").desc, col("l_linenumber").desc))
    val keys = out.groupBy("l_orderkey").count().filter(col("count") > 1).count()
    assert(keys === 0)
    assert(out.count() === li.select("l_orderkey").distinct().count())
    // the winner is the max-shipdate row for a sampled key
    val k = li.select("l_orderkey").limit(1).collect()(0).getLong(0)
    val expected = li.filter(col("l_orderkey") === k)
      .orderBy(col("l_shipdate").desc, col("l_linenumber").desc)
      .select("l_shipdate").collect()(0)
    val got = out.filter(col("l_orderkey") === k).select("l_shipdate").collect()(0)
    assert(got === expected)
  }

  test("latestByKeyAgg equals the window form on a total desc ordering") {
    val li = table("lineitem")
    val win = Dedup.latestByKey(li, Seq("l_orderkey"),
      Seq(col("l_shipdate").desc, col("l_linenumber").desc))
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    val agg = Dedup.latestByKeyAgg(li, Seq("l_orderkey"),
      struct(col("l_shipdate"), col("l_linenumber")))
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    assert(win.exceptAll(agg).isEmpty && agg.exceptAll(win).isEmpty)
  }

  test("duplicates + latest partition the input") {
    val li = table("lineitem")
    val order = Seq(col("l_shipdate").desc, col("l_linenumber").desc)
    val n1 = Dedup.latestByKey(li, Seq("l_orderkey"), order).count()
    val n2 = Dedup.duplicatesByKey(li, Seq("l_orderkey"), order).count()
    assert(n1 + n2 === li.count())
  }
}

class SkewSpec extends SparkSpec {
  test("saltedJoin equals the plain join") {
    val li = table("lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    val o = table("orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"),
      Seq(col("l_linenumber")), factor = 7)
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedJoin spreads a hot key across multiple shuffle partitions") {
    import spark.implicits._
    // 90%-skewed big side: key 1 dominates
    val big = (1L to 2000L).map(i => (if (i % 10 == 0) i else 1L, i))
      .toDF("k", "line")
    val small = Seq((1L, "hot"), (20L, "a"), (30L, "b")).toDF("k", "v")
    def hotPartitions(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("k") === 1L)
        .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
        .distinct().count()
    val plain = big.repartition(col("k")).join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, Seq("k"), Seq(col("line")), factor = 8)
    assert(hotPartitions(plain) === 1) // all hot rows on one reducer
    assert(hotPartitions(salted) > 1) // salt spreads them
    assert(salted.count() === plain.count())
  }

  test("saltedSumCount equals the direct aggregation") {
    val li = table("lineitem")
    val direct = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("total"),
        count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(li, Seq("l_orderkey"),
      col("l_quantity").cast("decimal(18,4)"), Seq(col("l_linenumber")), factor = 5)
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }
}

class QualityRulesSpec extends SparkSpec {
  private val rules = Seq(
    QualityRules.Rule(col("l_quantity") > 45, "ExcessQuantity"),
    QualityRules.Rule(col("l_discount") > 0.08, "HighDiscount"))

  test("clean + quarantined partition the input; reasons are ;-joined") {
    val li = table("lineitem")
    val clean = QualityRules.clean(li, rules)
    val bad = QualityRules.quarantined(li, rules)
    assert(clean.count() + bad.count() === li.count())
    val multi = bad.filter(col(QualityRules.ReasonCol) === "ExcessQuantity;HighDiscount")
    val expected = li.filter(col("l_quantity") > 45 && col("l_discount") > 0.08)
    assert(multi.count() === expected.count())
    assert(bad.columns.contains("RetentionDate"))
  }

  test("no rules fired -> everything clean") {
    val li = table("lineitem")
    val none = Seq(QualityRules.Rule(col("l_quantity") < 0, "Impossible"))
    assert(QualityRules.clean(li, none).count() === li.count())
    assert(QualityRules.quarantined(li, none).count() === 0)
  }
}

class MergeSpec extends SparkSpec {
  test("upsert: source wins on collision, unmatched target survives") {
    val o = table("orders").select("o_orderkey", "o_totalprice")
    val target = o.filter(col("o_orderkey") % 2 === 0)
    val source = o.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1)
    val merged = Merge.upsert(target, source, Seq("o_orderkey")).cache()
    assert(merged.count() === target.count()) // source keys ⊆ target keys
    val bumped = merged.join(o.withColumnRenamed("o_totalprice", "orig"), "o_orderkey")
      .filter(col("o_totalprice") =!= col("orig"))
    assert(bumped.count() === source.count())
  }

  test("conditionalUpsertMetrics counts updates/inserts like sp_upsert_claims") {
    val c = table("customer")
    val staging = c.filter(col("c_custkey") % 5 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 1)
      .unionByName(c.limit(0)) // no inserts
    val m = Merge.conditionalUpsertMetrics(c, staging,
      Seq("c_custkey"), Seq("c_acctbal")).collect()(0)
    assert(m.getAs[Long]("rows_updated") === staging.count())
    assert(m.getAs[Long]("rows_inserted") === 0)
    assert(m.getAs[Long]("total_rows") === c.count())
  }
}

class DimensionsSpec extends SparkSpec {
  test("date dimension: contiguous ids, correct names") {
    val d = Dimensions.dateDimension(spark,
      java.time.LocalDate.of(2020, 1, 1), java.time.LocalDate.of(2020, 12, 31))
    assert(d.count() === 366) // leap year
    val first = d.orderBy("DateID").collect()(0)
    assert(first.getAs[Int]("DateID") === 1)
    assert(first.getAs[String]("DayName") === "Wednesday")
    assert(first.getAs[String]("MonthName") === "January")
    assert(d.agg(max("DateID")).collect()(0).getInt(0) === 366)
  }

  test("extract produces distinct attribute rows") {
    val dim = Dimensions.extract(table("orders"), Seq("o_orderstatus", "o_orderpriority"))
    assert(dim.count() === dim.distinct().count())
    assert(dim.count() <= 15)
  }
}

class PiiSpec extends SparkSpec {
  test("salted sha256 is deterministic, salt-sensitive, 64 hex chars") {
    val df = table("customer").select(
      Pii.saltedSha256(col("c_custkey"), "s1").as("h1"),
      Pii.saltedSha256(col("c_custkey"), "s1").as("h1b"),
      Pii.saltedSha256(col("c_custkey"), "s2").as("h2"))
    assert(df.filter(col("h1") =!= col("h1b")).count() === 0)
    assert(df.filter(col("h1") === col("h2")).count() === 0)
    assert(df.filter(length(col("h1")) =!= 64).count() === 0)
  }
}

class MeasuresSpec extends SparkSpec {
  test("decimal sums are exact and partition-order independent") {
    val o = table("orders")
    val a = o.agg(Measures.decSum(col("o_totalprice"))).collect()(0).getDouble(0)
    val b = o.repartition(13).agg(Measures.decSum(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(a === b)
  }

  test("time intelligence: YTD accumulates, LY lines up") {
    val ti = Measures.timeIntelligence(table("orders"),
      col("o_orderdate"), col("o_totalprice")).cache()
    import spark.implicits._
    val y1996 = ti.filter(col("yr") === 1996).orderBy("mo")
      .select("amount_mtd", "amount_ytd").as[(Double, Double)].collect()
    val runningSum = y1996.map(_._1).scanLeft(0.0)(_ + _).tail
    y1996.map(_._2).zip(runningSum).foreach { case (ytd, exp) =>
      assert(math.abs(ytd - exp) < 1e-6)
    }
    val ly = ti.filter(col("yr") === 1996 && col("mo") === 3)
      .select("amount_ly").collect()(0).getDouble(0)
    val prev = ti.filter(col("yr") === 1995 && col("mo") === 3)
      .select("amount_mtd").collect()(0).getDouble(0)
    assert(ly === prev)
  }

  test("sketch distinct counts land within 3x the target rsd of exact") {
    val o = table("orders")
    val exact = o.agg(
      countDistinct(col("o_custkey")).as("a"),
      countDistinct(col("o_orderpriority")).as("b")).collect()(0)
    val approx = Measures.approxDistinctPack(
      o, col("o_custkey"), col("o_orderpriority"), rsd = 0.02).collect()(0)
    Seq((exact.getLong(0), approx.getLong(0)), (exact.getLong(1), approx.getLong(1)))
      .foreach { case (e, a) =>
        assert(math.abs(a - e).toDouble / e <= 0.06,
          s"approx $a vs exact $e exceeds 3*rsd")
      }
    // deterministic for fixed input, regardless of partitioning
    val again = Measures.approxDistinctPack(
      o.repartition(13), col("o_custkey"), col("o_orderpriority"), rsd = 0.02).collect()(0)
    assert(approx.getLong(0) == again.getLong(0) && approx.getLong(1) == again.getLong(1))
  }

  test("sketch percentiles track the exact interpolated ones") {
    val o = table("orders")
    val approx = Measures.approxPercentiles(
        o, col("o_orderstatus"), col("o_totalprice"), Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = o.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9))").as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1)(0), r.getSeq[Double](1)(1))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (a50, a90)) =>
      val (e50, e90) = exact(k)
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.05, s"$k p90: $a90 vs $e90")
    }
  }

  test("shipped sketch queries carry true bound-evidence columns") {
    // g14/g14b are rows-only at the driver (sketches aren't
    // cross-engine) — their rows must therefore carry their own
    // checkable invariant: every *_within_bound / *_ok boolean true
    val g14 = graft.SparkEntry.queries("g14_sketch_distinct")(spark, sfDir)
      .collect()(0)
    assert(g14.getAs[Boolean]("patients_within_bound"), g14.toString)
    assert(g14.getAs[Boolean]("providers_within_bound"), g14.toString)
    graft.SparkEntry.queries("g14b_sketch_percentiles")(spark, sfDir)
      .collect().foreach { r =>
        assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p90_ok") &&
          r.getAs[Boolean]("p99_ok"), r.toString)
      }
  }

  test("robustOutliers: hand-computed median/MAD/threshold") {
    import spark.implicits._
    // group a: med 3, adev {2,1,0,1,97}, mad 1, thr 4.4478 -> one
    // outlier (97); group b: symmetric, no outliers
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    val got = Measures.robustOutliers(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got("a") == ((5L, 3.0, 1.0, 1L)), got("a").toString)
    assert(got("b") == ((3L, 20.0, 10.0, 0L)), got("b").toString)
  }

  test("profile: null handling, native-type ordering, one row per column") {
    import spark.implicits._
    val df = Seq(
      (Some(10L), Some("b")), (Some(9L), Some("a")),
      (Some(10L), None), (None, Some("a")))
      .toDF("k", "s")
    val got = Profiler.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    // min/max order on the NATIVE type: 9 < 10 numerically even though
    // "10" < "9" as strings
    assert(got("k") == ((3L, 2L, "9", "10")), got("k").toString)
    assert(got("s") == ((3L, 2L, "a", "b")), got("s").toString)
    // single aggregation job with map-side partials
    val plan = Profiler.profile(table("lineitem"),
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("fuzzy join: hand case, brute-force equivalence, no nested-loop plan") {
    import spark.implicits._
    val right = Seq((1L, "kitten"), (2L, "sitting"), (3L, "flaw"))
      .toDF("id", "s")
    val left = Seq((10L, "kitten"), (11L, "mitten"), (12L, "sittin"),
      (13L, "lawn")).toDF("id", "s")
    val got = FuzzyJoin.byEditDistance(left, col("id"), col("s"),
        right, col("id"), col("s"), k = 1)
      .as[(Long, Long, Int)].collect().toSet
    // kitten=kitten (0), mitten~kitten (1 sub), sittin~sitting (1 del);
    // lawn~flaw is 2 edits — out
    assert(got === Set((10L, 1L, 0), (11L, 1L, 1), (12L, 2L, 1)))

    // empty strings on either side: lev("","")=0, lev("a","")=1 — the
    // lossless guarantee covers length-0 candidates too
    val le = Seq((20L, ""), (21L, "a"), (22L, "ab")).toDF("id", "s")
    val re = Seq((30L, ""), (31L, "b")).toDF("id", "s")
    val gotE = FuzzyJoin.byEditDistance(le, col("id"), col("s"),
        re, col("id"), col("s"), k = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(gotE === Set((20L, 30L, 0), (20L, 31L, 1), (21L, 30L, 1),
      (21L, 31L, 1), (22L, 31L, 1)), gotE.toString)

    // lossless vs brute force on real diverse strings, k=1 and k=2
    val names = table("documents")
      .select(col("doc_id").as("id"), lower(col("text")).substr(lit(1), lit(24)).as("s"))
    val l = names.filter(col("id") % 2 === 0)
    val r = names.filter(col("id") % 2 === 1)
    for (k <- Seq(1, 2)) {
      val blocked = FuzzyJoin.byEditDistance(l, col("id"), col("s"),
          r, col("id"), col("s"), k)
        .as[(Long, Long, Int)].collect().toSet
      val brute = l.toDF("lid", "ls").crossJoin(r.toDF("rid", "rs"))
        .withColumn("d", levenshtein(col("ls"), col("rs")))
        .filter(col("d") <= k)
        .select(col("lid"), col("rid"), col("d"))
        .as[(Long, Long, Int)].collect().toSet
      assert(blocked === brute, s"k=$k blocking must be lossless")
    }

    // plan: equi-join candidate generation, never a nested loop
    val plan = FuzzyJoin.byEditDistance(l, col("id"), col("s"),
      r, col("id"), col("s"), k = 1).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }

  test("incremental rollup: N batches land bit-identical to one recompute") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-incagg").toString
    val orders = table("orders")
      .select(col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
    // three uneven batches, one of them empty-for-some-groups
    val batches = Seq(
      orders.filter(col("o_orderkey").isNull), // degenerate: empty batch
      orders.filter(col("o_totalprice") < 50000),
      orders.filter(col("o_totalprice") >= 50000))
    var v = -1
    batches.zipWithIndex.foreach { case (b, i) =>
      v = IncrementalAgg.update(b, dir,
        Seq("o_orderstatus", "o_orderpriority"), Seq("o_totalprice"))
      assert(v == i, s"version must advance per batch")
    }
    val got = IncrementalAgg.read(spark, dir).get
      .select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
        col("sum_o_totalprice").cast("double").as("total"))
      .as[(String, String, Long, Double)].collect().toSet
    val full = orders.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === full, "incremental state must equal the full recompute")
    // state is groups-sized, stable-schema, and time-travelable
    val state = IncrementalAgg.read(spark, dir).get
    assert(state.count() == full.size)
    val prev = graft.sources.SnapshotStore.readVersion(spark, dir, 1).get
    assert(prev.schema == state.schema,
      "state schema must not drift across merges")
    assert(prev.agg(sum("n")).first().getLong(0) <
      state.agg(sum("n")).first().getLong(0))
  }

  test("winsorizedStats: hand-computed bounds, caps, and robust total") {
    import spark.implicits._
    // group a = 1..10: R-7 p05 = 1.45, p95 = 9.55; 1 caps low, 10 caps
    // high; winsorized total = 2+..+9 + 1.45 + 9.55 = 55.0
    val df = ((1 to 10).map(v => ("a", v.toDouble)) :+ (("b", 5.0)))
      .toDF("g", "v")
    val got = Measures.winsorizedStats(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got("a") == ((10L, 1L, 1L, 55.0, 1.45, 9.55)), got("a").toString)
    // a single-value group: bounds collapse to it, nothing caps
    assert(got("b") == ((1L, 0L, 0L, 5.0, 5.0, 5.0)), got("b").toString)
  }

  test("topN is deterministic and correctly bounded") {
    val top = Measures.topN(table("orders"), col("o_custkey"), col("o_totalprice"), 5)
    val rows = top.collect()
    assert(rows.length === 5)
    val totals = rows.map(_.getAs[Double]("total"))
    assert(totals.sameElements(totals.sorted.reverse))
  }

  test("yoyContribution: hand waterfall — deltas, 0-coalesce, shares sum to 1") {
    import spark.implicits._
    import java.sql.Date
    val df = Seq(
      // cell a: 10 -> 30 (+20); cell b: 20 -> 5 (-15); cell c: only
      // the new year (+5 from nothing); cell d: only OLD history
      // (2022) — outside the compared pair, must not appear
      ("a", Date.valueOf("2024-03-01"), 10.0),
      ("a", Date.valueOf("2025-02-01"), 30.0),
      ("b", Date.valueOf("2024-06-01"), 20.0),
      ("b", Date.valueOf("2025-07-01"), 5.0),
      ("c", Date.valueOf("2025-01-15"), 5.0),
      ("d", Date.valueOf("2022-05-01"), 99.0)
    ).toDF("cell", "dt", "v")
    val out = Measures.yoyContribution(df, col("cell"), col("dt"), col("v"))
      .orderBy("cell").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // total delta = +20 - 15 + 5 = +10
    assert(out.toSeq == Seq(
      ("a", 2025, 30.0, 10.0, 20.0, 2.0),
      ("b", 2025, 5.0, 20.0, -15.0, -1.5),
      ("c", 2025, 5.0, 0.0, 5.0, 0.5)))
    assert(math.abs(out.map(_._6).sum - 1.0) < 1e-9,
      "contribution shares must sum to 1")
    // a zero total delta yields null shares, not a division error
    val flat = Seq(
      ("a", Date.valueOf("2024-01-01"), 10.0),
      ("a", Date.valueOf("2025-01-01"), 5.0),
      ("b", Date.valueOf("2024-01-01"), 5.0),
      ("b", Date.valueOf("2025-01-01"), 10.0)
    ).toDF("cell", "dt", "v")
    val zero = Measures.yoyContribution(flat, col("cell"), col("dt"), col("v"))
      .collect()
    assert(zero.forall(_.isNullAt(5)), "zero total delta => null shares")
  }
}
