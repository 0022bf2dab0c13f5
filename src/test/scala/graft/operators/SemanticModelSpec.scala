package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.Join
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

  test("filters apply before aggregation (CALCULATE slicer semantics)") {
    val r = model.evaluate(Seq("segment"), Seq("n"),
      filters = Seq(col("amount") > 25.0)).orderBy("segment").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("AUTO", 1L), ("BUILDING", 2L)))
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
