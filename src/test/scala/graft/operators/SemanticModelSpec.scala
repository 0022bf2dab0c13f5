package graft.operators

import java.sql.Date

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemanticModelSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fact = Seq(
    // (claim_id, cust, amount, status)
    (1L, 10L, 100.0, "F"), (2L, 10L, 50.0, "O"),
    (3L, 11L, 30.0, "F"), (4L, 12L, 20.0, "O"),
    (5L, 12L, 0.0, "O")
  ).toDF("claim_id", "cust", "amount", "status")

  private lazy val dim = Seq(
    (10L, "BUILDING"), (11L, "AUTO"), (12L, "AUTO")
  ).toDF("c_id", "segment")

  private def model = SemanticModel(
    fact = fact,
    dimensions = Map("customer" -> Dimension(dim, "cust", "c_id")),
    measures = Seq(
      "n" -> count(lit(1)),
      "total" -> Measures.decSum(col("amount")),
      "n_f" -> SemanticModel.calculateCount(col("status") === "F"),
      "total_f" -> SemanticModel.calculateSum(col("amount"),
        col("status") === "F"),
      "f_rate" -> SemanticModel.divide(
        SemanticModel.calculateCount(col("status") === "F").cast("double"),
        count(lit(1)))))

  test("request over a dimension column joins, groups, computes the catalog") {
    val out = model.evaluate(Seq("segment"), Seq("n", "total", "n_f",
      "total_f", "f_rate")).orderBy("segment").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getLong(3))).toSeq ==
      Seq(("AUTO", 3L, 50.0, 1L), ("BUILDING", 2L, 150.0, 1L)))
    // CALCULATE-filtered sum and DIVIDE ratio
    assert(out.map(_.getDouble(4)).toSeq == Seq(30.0, 100.0))
    assert(out.map(_.getDouble(5)).toSeq == Seq(1.0 / 3, 0.5))
  }

  test("grand total with no group-by is the one-row card") {
    val r = model.evaluate(Nil, Seq("n", "total")).collect()
    assert(r.length == 1 && r(0).getLong(0) == 5L && r(0).getDouble(1) == 200.0)
  }

  test("join pruning: a fact-only request plans NO join; a dim request broadcasts one") {
    val factOnly = model.evaluate(Seq("status"), Seq("n", "total"))
    assert(factOnly.queryExecution.optimizedPlan.collect {
      case j: Join => j }.isEmpty,
      "fact-only request must not join any dimension")
    val dimReq = model.evaluate(Seq("segment"), Seq("n"))
    assert(dimReq.queryExecution.optimizedPlan.collect {
      case j: Join => j }.size == 1)
    // toString sees through the AQE wrapper (the broadcast hint plans
    // the join statically)
    assert(dimReq.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "dimension join must broadcast")
    // a filter referencing a dim column pulls the dimension in too
    val slicer = model.evaluate(Seq("status"), Seq("n"),
      filters = Seq(col("segment") === "AUTO"))
    assert(slicer.queryExecution.optimizedPlan.collect {
      case j: Join => j }.size == 1)
    assert(slicer.orderBy("status").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("F", 1L), ("O", 2L)))
  }

  test("requests may group/filter by the dimension-side join key") {
    // dimColumns documents that either side of the relationship is
    // requestable; pre-fix, joinedFor dropped the dim key after the
    // join so evaluate(groupBy = c_id) passed validation and died
    // with an unresolved-column AnalysisException
    val byKey = model.evaluate(Seq("c_id"), Seq("n", "total"))
      .orderBy("c_id").collect()
    assert(byKey.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq == Seq((10L, 2L, 150.0), (11L, 1L, 30.0), (12L, 2L, 20.0)))
    val filtered = model.evaluate(Seq("segment"), Seq("n"),
      filters = Seq(col("c_id") === 12L)).collect()
    assert(filtered.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("AUTO", 2L)))
    // a payload-only request still drops the dim key: exactly the
    // requested columns survive
    assert(model.evaluate(Seq("segment"), Seq("n")).columns.toSeq ==
      Seq("segment", "n"))
  }

  test("filters apply before aggregation (CALCULATE slicer semantics)") {
    val r = model.evaluate(Seq("segment"), Seq("n"),
      filters = Seq(col("amount") > 25.0)).orderBy("segment").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("AUTO", 1L), ("BUILDING", 2L)))
  }

  test("blank member: unmatched fact rows survive the dim join under a null member") {
    // cust 99 has no dimension row — DAX's blank-member behavior: it
    // groups under null, and the grand total is IDENTICAL whether or
    // not the request pulls the dimension in
    val f2 = fact.union(Seq((6L, 99L, 40.0, "F"))
      .toDF("claim_id", "cust", "amount", "status"))
    val m = model.copy(fact = f2)
    val bySeg = m.evaluate(Seq("segment"), Seq("n", "total"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1.map(_.toString).getOrElse(""))
    assert(bySeg.toSeq == Seq((None, 1L, 40.0),
      (Some("AUTO"), 3L, 50.0), (Some("BUILDING"), 2L, 150.0)))
    val card = m.evaluate(Nil, Seq("n", "total")).collect()(0)
    assert(card.getLong(0) == 6L && card.getDouble(1) == 240.0)
    assert(bySeg.map(_._2).sum == card.getLong(0),
      "dim-joined total must equal the fact-only total")
  }

  test("fact shadows a same-named dimension column; two dims sharing one fail fast") {
    // the dimension also carries a 'status' column — the fact's wins
    // (the dim copy is dropped at join time), so mixing fact and dim
    // names in one request is never ambiguous against the fact
    val dimS = Seq((10L, "BUILDING", "zzz"), (11L, "AUTO", "zzz"),
      (12L, "AUTO", "zzz")).toDF("c_id", "segment", "status")
    val mS = model.copy(dimensions =
      Map("customer" -> Dimension(dimS, "cust", "c_id")))
    val out = mS.evaluate(Seq("segment", "status"), Seq("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.forall(r => r._2 == "F" || r._2 == "O"),
      s"fact 'status' must win over the dimension's: ${out.mkString(", ")}")
    // a payload name served by TWO joined dimensions has no principled
    // winner: clear error, not an AnalysisException
    val dimB = Seq((10L, "NORTH")).toDF("r_id", "segment")
    val mAmb = model.copy(dimensions = Map(
      "customer" -> Dimension(dim, "cust", "c_id"),
      "region" -> Dimension(dimB, "cust", "r_id")))
    val e = intercept[IllegalArgumentException] {
      mAmb.evaluate(Seq("segment"), Seq("n")) }
    assert(e.getMessage.contains("ambiguous across dimensions"))
  }

  private lazy val timeFact = Seq(
    // (dt, amount, seg): months 2024-01 (10+5), 2024-02 (20), 2025-01 (40)
    (Date.valueOf("2024-01-03"), 10.0, "a"),
    (Date.valueOf("2024-01-20"), 5.0, "b"),
    (Date.valueOf("2024-02-10"), 20.0, "a"),
    (Date.valueOf("2025-01-07"), 40.0, "a")
  ).toDF("dt", "amount", "seg")

  private lazy val datesDim = Seq(
    (Date.valueOf("2024-01-03"), 2024, 1), (Date.valueOf("2024-01-20"), 2024, 1),
    (Date.valueOf("2024-02-10"), 2024, 2), (Date.valueOf("2025-01-07"), 2025, 1)
  ).toDF("d_date", "d_year", "d_month")

  private def timeModel = SemanticModel(
    fact = timeFact,
    dimensions = Map("dates" -> Dimension(datesDim, "dt", "d_date",
      hierarchies = Map("calendar" -> Seq("d_year", "d_month")))),
    measures = Seq("total" -> Measures.decSum(col("amount")),
      "n" -> count(lit(1))),
    dates = Some(DatesRole("dates", "d_year", "d_month")))

  test("evaluateTime: the Time Calculation group through the Dates dimension") {
    val out = timeModel.evaluateTime("total",
      Seq("mtd", "ytd", "ly", "yoy_delta")).orderBy("yr", "mo").collect()
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    assert(out.map(r => (r.getInt(0), r.getInt(1), d(r, 2), d(r, 3),
      d(r, 4), d(r, 5))).toSeq == Seq(
      (2024, 1, Some(15.0), Some(15.0), None, None),
      (2024, 2, Some(20.0), Some(35.0), None, None),
      (2025, 1, Some(40.0), Some(40.0), Some(15.0), Some(25.0))))
    // filters apply before the month-grain aggregation
    val flt = timeModel.evaluateTime("total", Seq("mtd"),
      filters = Seq(col("amount") > 7.0)).orderBy("yr", "mo").collect()
    assert(flt.map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq ==
      Seq((2024, 1, 10.0), (2024, 2, 20.0), (2025, 1, 40.0)))
    // the matrix shape: a slicer column makes each cell its own
    // independent series — 2025-01 'a' must look up a's 2024-01 (10),
    // not the blended month total (15)
    val mtx = timeModel.evaluateTime("total", Seq("mtd", "ly"),
      groupBy = Seq("seg")).orderBy("seg", "yr", "mo").collect()
    assert(mtx.map(r => (r.getString(0), r.getInt(1), r.getInt(2),
      r.getDouble(3), d(r, 4))).toSeq == Seq(
      ("a", 2024, 1, 10.0, None), ("a", 2024, 2, 20.0, None),
      ("a", 2025, 1, 40.0, Some(10.0)), ("b", 2024, 1, 5.0, None)))
    intercept[IllegalArgumentException] { // time axes are produced, not taken
      timeModel.evaluateTime("total", Seq("mtd"), groupBy = Seq("mo")) }
    intercept[IllegalArgumentException] { // unknown slicer column
      timeModel.evaluateTime("total", Seq("mtd"), groupBy = Seq("ghost")) }
    // unknown variant / repeated variant / missing DatesRole fail fast
    intercept[IllegalArgumentException] {
      timeModel.evaluateTime("total", Seq("wtd")) }
    intercept[IllegalArgumentException] {
      timeModel.evaluateTime("total", Seq("ytd", "ytd")) }
    intercept[IllegalArgumentException] {
      timeModel.copy(dates = None).evaluateTime("total", Seq("ytd")) }
    intercept[IllegalArgumentException] { // role naming a missing column
      timeModel.copy(dates = Some(DatesRole("dates", "d_year", "nope"))) }
  }

  test("evaluateTopN: measure-ranked cells with a deterministic tie cut") {
    // totals: BUILDING 150, AUTO 50 -> top-1 is BUILDING
    val top1 = model.evaluateTopN(1, Seq("segment"), Seq("total", "n"))
      .collect()
    assert(top1.length == 1 && top1(0).getString(0) == "BUILDING" &&
      top1(0).getDouble(1) == 150.0)
    // n exceeding the cell count returns all cells, ranked
    val all = model.evaluateTopN(10, Seq("segment"), Seq("total"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(all.toSeq == Seq(("BUILDING", 150.0), ("AUTO", 50.0)))
    // ties cut deterministically by the groupBy tiebreak: count-ranked,
    // both segments have... distinct n (2 vs 3) — rank by n instead
    val byN = model.evaluateTopN(1, Seq("segment"), Seq("n")).collect()
    assert(byN(0).getString(0) == "AUTO" && byN(0).getLong(1) == 3L)
    intercept[IllegalArgumentException] {
      model.evaluateTopN(0, Seq("segment"), Seq("n")) }
    intercept[IllegalArgumentException] {
      model.evaluateTopN(3, Nil, Seq("n")) }
    // the cut plans TakeOrderedAndProject, never a global sort
    val plan = model.evaluateTopN(1, Seq("segment"), Seq("total"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"TOPN must cut via TakeOrderedAndProject:\n$plan")
  }

  test("evaluateTime drill: collapsed-year rows follow DAX year-context semantics") {
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    // year level: mtd/qtd/ytd/r12m at the year's LAST observed month,
    // ly/yoy against the FULL previous year (contiguity-guarded)
    val yr = timeModel.evaluateTime("total",
        Seq("mtd", "qtd", "ytd", "r12m", "ly", "yoy_delta", "yoy_pct"),
        drill = Some(("calendar", "d_year")))
      .orderBy("d_year").collect()
    assert(yr.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), d(r, 5), d(r, 6))).toSeq == Seq(
      // 2024: last month = Feb → mtd 20, qtd/ytd 35; no prior year
      (2024, 20.0, 35.0, 35.0, 35.0, None, None),
      // 2025: last month = Jan → mtd/qtd/ytd 40; r12m spans 2024-02..
      // 2025-01 (60); ly = FULL 2024 (35), yoy_delta = 40 - 35
      (2025, 40.0, 40.0, 40.0, 60.0, Some(35.0), Some(5.0))))
    assert(yr.head.schema.fieldNames.head == "d_year",
      "drill prefix carries the hierarchy level name")
    // per-cell year rows: segment a's 2025 looks up a's 2024 total
    // (30), not the blended 35
    val cells = timeModel.evaluateTime("total", Seq("ytd", "ly"),
        groupBy = Seq("seg"), drill = Some(("calendar", "d_year")))
      .orderBy("seg", "d_year").collect()
    assert(cells.map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
      d(r, 3))).toSeq == Seq(
      ("a", 2024, 30.0, None), ("a", 2025, 40.0, Some(30.0)),
      ("b", 2024, 5.0, None)))
    // month level: the standard series under the hierarchy level names
    val mon = timeModel.evaluateTime("total", Seq("mtd", "ly"),
        drill = Some(("calendar", "d_month")))
      .orderBy("d_year", "d_month").collect()
    assert(mon.map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
      d(r, 3))).toSeq == Seq(
      (2024, 1, 15.0, None), (2024, 2, 20.0, None),
      (2025, 1, 40.0, Some(15.0))))
    assert(mon.head.schema.fieldNames.take(2).toSeq ==
      Seq("d_year", "d_month"))
    // unknown level / unknown hierarchy fail fast
    intercept[IllegalArgumentException] {
      timeModel.evaluateTime("total", Seq("mtd"),
        drill = Some(("calendar", "ghost"))) }
    // the role's calendar columns are derived, not sliceable — a
    // groupBy copy would collide with the drill output's level names
    intercept[IllegalArgumentException] {
      timeModel.evaluateTime("total", Seq("mtd"), groupBy = Seq("d_year")) }
    intercept[IllegalArgumentException] {
      timeModel.evaluateTime("total", Seq("mtd"),
        drill = Some(("ghost", "d_year"))) }
    // sub-month level fails fast: the calculations are month-grain
    val withDay = SemanticModel(
      fact = timeFact,
      dimensions = Map("dates" -> Dimension(
        datesDim.withColumn("d_day", lit(1)), "dt", "d_date",
        hierarchies = Map("calendar" -> Seq("d_year", "d_month", "d_day")))),
      measures = Seq("total" -> Measures.decSum(col("amount"))),
      dates = Some(DatesRole("dates", "d_year", "d_month")))
    val e = intercept[IllegalArgumentException] {
      withDay.evaluateTime("total", Seq("mtd"),
        drill = Some(("calendar", "d_day"))) }
    assert(e.getMessage.contains("month-grain"))
  }

  test("time request plan: dates dim broadcasts; only aggregated rows ever shuffle") {
    val conf = spark.conf
    val oldBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      // threshold off: a surviving BroadcastHashJoin proves the HINT,
      // not a small-table auto-broadcast
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val plan = timeModel.evaluateTime("total", Seq("ytd", "ly"))
        .queryExecution.executedPlan
      val bhjs = plan.collect { case b: BroadcastHashJoinExec => b }
      assert(bhjs.nonEmpty, "dates dimension must broadcast")
      assert(bhjs.forall(b => b.collect {
        case e: ShuffleExchangeExec => e }.isEmpty),
        "no exchange may feed the dim join (fact rows must not shuffle)")
      // every shuffle in the plan moves month-grain (post-aggregate)
      // rows: each exchange has a HashAggregate beneath it
      val rawShuffles = plan.collect {
        case e: ShuffleExchangeExec if e.child.collect {
          case _: HashAggregateExec => 1 }.isEmpty => e }
      assert(rawShuffles.isEmpty,
        s"a shuffle moves pre-aggregation fact rows:\n${rawShuffles.mkString("\n")}")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("evaluateDrill groups by the hierarchy prefix; evaluateRollup tags subtotals") {
    val drill = timeModel.evaluateDrill("dates", "calendar", "d_month",
      Seq("n")).orderBy("d_year", "d_month").collect()
    assert(drill.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((2024, 1, 2L), (2024, 2, 1L), (2025, 1, 1L)))
    val top = timeModel.evaluateDrill("dates", "calendar", "d_year", Seq("n"))
    assert(top.columns.toSeq == Seq("d_year", "n"))

    val roll = timeModel.evaluateRollup("dates", "calendar", Seq("n", "total"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    // leaf rows (lvl 0), year subtotals (lvl 1), grand total (lvl 3)
    assert(roll.count(_._3 == 0L) == 3 && roll.count(_._3 == 1L) == 2 &&
      roll.count(_._3 == 3L) == 1)
    val grand = roll.find(_._3 == 3L).get
    assert(grand._1.isEmpty && grand._2.isEmpty &&
      grand._4 == 4L && grand._5 == 75.0)
    val y2024 = roll.find(r => r._3 == 1L && r._1.contains(2024)).get
    assert(y2024._4 == 3L && y2024._5 == 35.0)

    intercept[IllegalArgumentException] { // unknown level
      timeModel.evaluateDrill("dates", "calendar", "d_day", Seq("n")) }
    intercept[IllegalArgumentException] { // unknown hierarchy
      timeModel.evaluateDrill("dates", "fiscal", "d_year", Seq("n")) }
    intercept[IllegalArgumentException] { // unknown dimension
      timeModel.evaluateDrill("nope", "calendar", "d_year", Seq("n")) }
    intercept[IllegalArgumentException] { // hierarchy level not on the dim
      Dimension(datesDim, "dt", "d_date",
        hierarchies = Map("bad" -> Seq("d_year", "ghost"))) }
  }

  test("DIVIDE is null on a zero denominator; unknown names fail fast") {
    val m = SemanticModel(fact, Map.empty, Seq(
      "zero_rate" -> SemanticModel.divide(sum(col("amount")),
        sum(when(col("status") === "X", col("amount")).otherwise(0.0)))))
    assert(m.evaluate(Nil, Seq("zero_rate")).collect()(0).isNullAt(0))
    intercept[IllegalArgumentException] {
      model.evaluate(Seq("segment"), Seq("nope")) }
    intercept[IllegalArgumentException] {
      model.evaluate(Seq("no_such_col"), Seq("n")) }
    intercept[IllegalArgumentException] {
      model.evaluate(Seq("segment"), Nil) }
    intercept[IllegalArgumentException] { // duplicate measure names
      SemanticModel(fact, Map.empty, Seq("a" -> count(lit(1)),
        "a" -> count(lit(1)))) }
  }
}
