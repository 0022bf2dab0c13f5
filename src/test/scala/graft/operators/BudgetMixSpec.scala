package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** budgetMix: proportional water-filling with capacity caps — hand
  * cases, saturation, the budget invariant, and equality with a
  * brute-force ITERATIVE reference on an adversarial mix. */
class BudgetMixSpec extends SparkSpec {
  import spark.implicits._

  private def solve(rows: Seq[(String, Long, Double)], budget: Long) =
    Sampling.budgetMix(rows.toDF("s", "c", "w"),
      col("s"), col("c"), col("w"), lit(budget))
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Boolean]("capped"), r.getAs[Double]("allocation"),
          r.getAs[Double]("sample_rate"))).toMap

  /** The obviously-correct sequential water-filling: repeatedly cap
    * every source whose proportional share exceeds its capacity,
    * re-level, until stable. */
  private def reference(rows: Seq[(String, Long, Double)],
                        budget: Long): Map[String, Double] = {
    val bPrime = math.min(budget, rows.map(_._2).sum).toDouble
    var capped = Set.empty[String]
    var done = false
    while (!done) {
      val remW = rows.filterNot(r => capped(r._1)).map(_._3).sum
      val remB = bPrime - rows.filter(r => capped(r._1)).map(_._2.toDouble).sum
      val newly = rows.filterNot(r => capped(r._1))
        .filter(r => remB / remW * r._3 >= r._2.toDouble).map(_._1)
      if (newly.isEmpty) done = true else capped ++= newly
    }
    val remW = rows.filterNot(r => capped(r._1)).map(_._3).sum
    val remB = bPrime - rows.filter(r => capped(r._1)).map(_._2.toDouble).sum
    rows.map(r => r._1 ->
      (if (capped(r._1)) r._2.toDouble else remB / remW * r._3)).toMap
  }

  test("a zero or negative budget allocates nothing") {
    for (b <- Seq(0L, -5L)) {
      val got = solve(Seq(("a", 100L, 0.5), ("b", 50L, 0.5)), b)
      assert(got.values.forall(v => !v._1 && v._2 === 0.0),
        s"budget $b must allocate zero everywhere: $got")
    }
  }

  test("no caps: pure proportional split; saturation: everything capped") {
    val even = solve(Seq(("a", 100L, 0.5), ("b", 100L, 0.5)), 100L)
    assert(even("a") === ((false, 50.0, 0.5)) && even("b") === ((false, 50.0, 0.5)))
    val sat = solve(Seq(("a", 10L, 0.5), ("b", 20L, 0.5)), 1000L)
    assert(sat("a") === ((true, 10.0, 1.0)) && sat("b") === ((true, 20.0, 1.0)),
      "budget above total capacity must saturate every source")
  }

  test("cap + redistribution: the freed budget water-fills the rest") {
    // fair share of 600 is 300 each; a caps at 10, b absorbs 590
    val got = solve(Seq(("a", 10L, 0.5), ("b", 1000L, 0.5)), 600L)
    assert(got("a") === ((true, 10.0, 1.0)))
    assert(got("b")._1 === false && got("b")._2 === 590.0)
  }

  test("cascade: capping one source pushes the level past the next") {
    // levels: λ0=900; a (ratio 30) caps; λ1=(900-15)/0.5... weights
    // .5/.3/.2 — a then b cap in ratio order, c absorbs the rest
    val got = solve(Seq(("a", 15L, 0.5), ("b", 60L, 0.3), ("c", 900L, 0.2)), 900L)
    assert(got("a")._1 && got("b")._1, s"both small sources must cap: $got")
    assert(!got("c")._1 && math.abs(got("c")._2 - (900 - 15 - 60)) < 1e-6)
  }

  test("weight 0 allocates 0 and never caps, even when budget exceeds " +
    "the positive-weight capacity") {
    // budget 1000 > a's capacity 100: a saturates, z must still get 0
    // (not its full 500 — the Inf <= Inf trap)
    val got = solve(Seq(("a", 100L, 1.0), ("z", 500L, 0.0)), 1000L)
    assert(got("a") === ((true, 100.0, 1.0)))
    assert(got("z") === ((false, 0.0, 0.0)),
      s"zero weight must allocate nothing: ${got("z")}")
  }

  test("all-zero weights allocate nothing (no NaN poisoning)") {
    val got = solve(Seq(("a", 100L, 0.0), ("b", 50L, 0.0)), 80L)
    assert(got.values.forall(v => !v._1 && v._2 === 0.0 && v._3 === 0.0),
      s"all-zero weights must yield all-zero allocations: $got")
  }

  test("a negative or null weight raises in-plan") {
    val e = intercept[Exception] {
      solve(Seq(("a", 100L, 0.5), ("bad", 50L, -0.1)), 80L)
    }
    assert(e.getMessage.contains("budgetMix") ||
      Option(e.getCause).exists(_.getMessage.contains("budgetMix")),
      s"error must name the operator: ${e.getMessage}")
    val eNull = intercept[Exception] {
      Sampling.budgetMix(
        Seq(("a", 100L, Some(0.5)), ("bad", 50L, None))
          .toDF("s", "c", "w"),
        col("s"), col("c"), col("w"), lit(80L)).collect()
    }
    assert(eNull.getMessage.contains("budgetMix") ||
      Option(eNull.getCause).exists(_.getMessage.contains("budgetMix")))
  }

  test("matches the iterative reference on an adversarial mix; budget exact") {
    val rows = (1 to 17).map { i =>
      val c = ((i * 7919) % 400 + 20).toLong // 20..419, scattered
      val w = ((i * 104729) % 97 + 1) / 100.0 // 0.01..0.97, unnormalized
      (s"s$i", c, w)
    }
    for (budget <- Seq(50L, 500L, 2000L, 5000L)) {
      val got = solve(rows, budget)
      val ref = reference(rows, budget)
      rows.foreach { case (s, _, _) =>
        assert(math.abs(got(s)._2 - ref(s)) < 1e-4,
          s"budget=$budget source=$s: ${got(s)._2} vs ref ${ref(s)}")
      }
      val total = got.values.map(_._2).sum
      val expect = math.min(budget, rows.map(_._2).sum).toDouble
      assert(math.abs(total - expect) < 1e-3,
        s"allocations must sum to min(budget, capacity): $total vs $expect")
    }
  }
}
