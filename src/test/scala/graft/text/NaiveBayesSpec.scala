package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t29/t29b: multinomial Naive Bayes — hand-computed add-one model
  * values, classification with priors and margins, OOV handling, and
  * the deterministic argmax tie-break. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def d12(x: Double): BigDecimal =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)

  // counts — a: x=3, y=1 (mass 4); b: z=2 (mass 2); vocab {x,y,z}
  private val train = Seq(
    (1L, "a", "x x y"), (2L, "a", "x"), (3L, "b", "z z"))
    .toDF("doc_id", "label", "text")

  test("model: dense add-one log-probs, hand-computed") {
    val m = NaiveBayes.model(train, col("text"), col("label"))
      .orderBy("label", "token").collect()
    assert(m.length === 6, "3 vocab tokens x 2 labels, densified")
    val got = m.map(r0 => ((r0.getString(1), r0.getString(0)),
      (r0.getLong(2), r0.getDouble(3)))).toMap
    assert(got(("a", "x")) === ((3L, r(math.log(4.0 / 7.0), 9))))
    assert(got(("a", "y")) === ((1L, r(math.log(2.0 / 7.0), 9))))
    assert(got(("a", "z")) === ((0L, r(math.log(1.0 / 7.0), 9))))
    assert(got(("b", "x")) === ((0L, r(math.log(1.0 / 5.0), 9))))
    assert(got(("b", "z")) === ((2L, r(math.log(3.0 / 5.0), 9))))
  }

  test("model: minDf drops rare tokens and re-bases the denominators") {
    // total occurrences: x=3, y=1, z=2 -> minDf=2 keeps {x, z};
    // label a's kept mass is 3 (its y occurrence is gone), |V|=2
    val m = NaiveBayes.model(train, col("text"), col("label"), minDf = 2L)
      .collect().map(r0 => ((r0.getString(1), r0.getString(0)),
        (r0.getLong(2), r0.getDouble(3)))).toMap
    assert(m.keySet.map(_._2) === Set("x", "z"), "y (count 1) is cut")
    assert(m(("a", "x")) === ((3L, r(math.log(4.0 / 5.0), 9))))
    assert(m(("a", "z")) === ((0L, r(math.log(1.0 / 5.0), 9))))
    assert(m(("b", "z")) === ((2L, r(math.log(3.0 / 4.0), 9))))
    assert(m(("b", "x")) === ((0L, r(math.log(1.0 / 4.0), 9))))
  }

  test("classify: argmax with priors, margin = best minus runner-up") {
    val score = Seq((10L, "a", "x y q")).toDF("doc_id", "label", "text")
    val out = NaiveBayes.classify(train, score,
      col("doc_id"), col("text"), col("label")).collect()
    assert(out.length === 1)
    val row = out.head
    // q is OOV -> ignored; scores = prior + logp(x) + logp(y)
    val sA = d12(r(math.log(2.0 / 3.0), 9)) +
      d12(r(math.log(4.0 / 7.0), 9)) + d12(r(math.log(2.0 / 7.0), 9))
    val sB = d12(r(math.log(1.0 / 3.0), 9)) +
      d12(r(math.log(1.0 / 5.0), 9)) + d12(r(math.log(1.0 / 5.0), 9))
    assert(sA > sB, "sanity: a must win on its own tokens")
    assert(row.getString(2) === "a")
    assert(row.getDouble(3) === r(sA.toDouble, 6))
    assert(row.getDouble(4) === r((sA - sB).toDouble, 6))
    assert(row.getBoolean(5))
  }

  test("labelAudit: a planted mislabel is flagged, clean docs are not") {
    // four strongly-separable "good" docs, three "bad" docs, plus doc
    // 99: bad-vocabulary text carrying the label "good" — the planted
    // noise. The model (trained WITH the bad label in) still argmaxes
    // it to "bad" with high margin.
    val noisy = Seq(
      (1L, "good", "fine nice fine"), (2L, "good", "nice fine"),
      (3L, "good", "fine fine"), (4L, "good", "nice nice fine"),
      (5L, "bad", "spam junk spam"), (6L, "bad", "junk junk"),
      (7L, "bad", "spam spam"),
      (99L, "good", "spam junk junk spam"))
      .toDF("doc_id", "label", "text")
    val flagged = NaiveBayes.labelAudit(noisy, col("doc_id"),
      col("text"), col("label"), minMargin = 1.0).collect()
    assert(flagged.map(_.getLong(0)).toSeq === Seq(99L),
      "exactly the planted mislabel is flagged")
    assert(flagged.head.getString(1) === "good")
    assert(flagged.head.getString(2) === "bad")
    assert(!flagged.head.getBoolean(5))
    // raising the margin gate above the disagreement silences it
    assert(NaiveBayes.labelAudit(noisy, col("doc_id"), col("text"),
      col("label"), minMargin = 100.0).count() === 0L)
  }

  test("calibration: integer bins, caps at 10, counts reconcile") {
    val score = Seq(
      (10L, "a", "x x x"),   // strong a -> correct, some margin
      (11L, "b", "z z"),     // strong b -> correct
      (12L, "b", "x"))       // a-vocab text labeled b -> incorrect
      .toDF("doc_id", "label", "text")
    val cal = NaiveBayes.calibration(NaiveBayes.classify(
        train, score, col("doc_id"), col("text"), col("label")))
      .collect().map(r0 => r0.getInt(0) -> ((r0.getLong(1), r0.getLong(2))))
    assert(cal.map(_._2._1).sum === 3L, "every scored doc lands in a bin")
    assert(cal.map(_._2._2).sum === 2L, "two of three are correct")
    assert(cal.forall { case (b, _) => b >= 0 && b <= 10 })
    // a margin far beyond the cap still lands in bin 10
    val wide = Seq((20L, "a", "x " * 200)).toDF("doc_id", "label", "text")
    val capped = NaiveBayes.calibration(NaiveBayes.classify(
        train, wide, col("doc_id"), col("text"), col("label"))).collect()
    assert(capped.map(_.getInt(0)).toSeq === Seq(10))
  }

  test("classify: all-OOV doc produces no row") {
    val score = Seq((10L, "a", "q q q"), (11L, "b", "z"))
      .toDF("doc_id", "label", "text")
    val out = NaiveBayes.classify(train, score,
      col("doc_id"), col("text"), col("label")).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(11L))
  }

  test("classify: exact score tie breaks to the alphabetically-first label") {
    // symmetric corpus: labels m/k mirror each other through x<->y,
    // so "x y" scores identically under both -> tie -> pred = "k"
    val sym = Seq((1L, "m", "x"), (2L, "k", "y")).toDF("doc_id", "label", "text")
    val out = NaiveBayes.classify(sym, Seq((9L, "m", "x y"))
        .toDF("doc_id", "label", "text"),
      col("doc_id"), col("text"), col("label")).collect()
    assert(out.head.getString(2) === "k")
    assert(out.head.getDouble(4) === 0.0, "tie margin is exactly zero")
    assert(!out.head.getBoolean(5))
  }

  test("classify plan: model and priors join broadcast, scoring is map-only") {
    val d = table("documents")
    val plan = NaiveBayes.classify(
      d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0),
      col("doc_id"), col("text"), col("lang"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "token-model lookup must be a broadcast hash join")
    assert(!plan.contains("SortMergeJoin"),
      "no corpus-sized shuffle join anywhere in the scoring path")
  }
}
