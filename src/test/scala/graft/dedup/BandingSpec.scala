package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Banding tuner: the S-curve math, the argmin's threshold behavior,
  * and the loop closed against d16's measured recall — tuned
  * parameters must beat the assumed (4, 4) default on a corpus built
  * so the default demonstrably misses. */
class BandingSpec extends SparkSpec {
  import spark.implicits._

  test("candidateProb: closed forms and monotonicity") {
    // b=1, r=1: P = s (up to the 1-(1-s) round trip in IEEE)
    assert(math.abs(Banding.candidateProb(0.3, 1, 1) - 0.3) < 1e-12)
    // monotone in s for fixed (b, r)
    val ps = (1 to 9).map(i => Banding.candidateProb(i / 10.0, 4, 4))
    assert(ps === ps.sorted)
    // more bands at fixed r can only raise the collision probability
    assert(Banding.candidateProb(0.3, 16, 1) > Banding.candidateProb(0.3, 4, 1))
  }

  test("errorAreas: fp shrinks and fn grows as r rises (fixed K)") {
    val (fpLoose, fnLoose) = Banding.errorAreas(0.3, 16, 1)
    val (fpTight, fnTight) = Banding.errorAreas(0.3, 1, 16)
    assert(fpLoose > fpTight, "r=1 collides far below threshold")
    assert(fnLoose < fnTight, "r=16 misses far above threshold")
  }

  test("tune: low thresholds pick recall banding, high thresholds precision") {
    val low = Banding.tune(0.15, maxK = 16)
    assert(low.rowsPerBand === 1 && low.bands >= 4,
      s"at t=0.15 the tuner must pick single-row (recall) banding: got $low")
    val high = Banding.tune(0.9, maxK = 16)
    assert(high.rowsPerBand >= 8 && high.rowsPerBand > high.bands,
      s"at t=0.9 the tuner must pick deep-row (precision) banding: got $high")
    // budget respected across a sweep, and fn-weighting lowers r
    for (t <- Seq(0.1, 0.3, 0.5, 0.7, 0.9)) {
      val p = Banding.tune(t, maxK = 16)
      assert(p.k <= 16 && p.bands >= 1 && p.rowsPerBand >= 1)
      val recallBiased = Banding.tune(t, maxK = 16, fpWeight = 0.1, fnWeight = 0.9)
      assert(recallBiased.rowsPerBand <= p.rowsPerBand ||
        recallBiased.fnArea <= p.fnArea,
        s"fn-weighting must not trade recall away at t=$t")
    }
  }

  test("tune: fails fast past the MinHash pool (a plan the signature " +
    "pass could not execute)") {
    val e = intercept[IllegalArgumentException] {
      Banding.tune(0.5, maxK = TextDedup.MinHashPoolA.size + 1)
    }
    assert(e.getMessage.contains("pool"),
      s"the error must explain the pool cap: ${e.getMessage}")
    // the boundary itself is legal
    val p = Banding.tune(0.5, maxK = TextDedup.MinHashPoolA.size)
    assert(p.k <= TextDedup.MinHashPoolA.size)
  }

  test("extended pools: contract prefix intact, values distinct") {
    assert(TextDedup.MinHashPoolA.take(16) === TextDedup.MinHashA)
    assert(TextDedup.MinHashPoolB.take(16) === TextDedup.MinHashB)
    assert(TextDedup.MinHashPoolA.size === 64 &&
      TextDedup.MinHashPoolB.size === 64)
    assert(TextDedup.MinHashPoolA.distinct.size === 64)
    assert(TextDedup.MinHashPoolB.distinct.size === 64)
  }

  test("d16 closed-loop: tuned banding recall >= the assumed (4,4) on a miss-prone corpus") {
    // 12 near-dup pairs at trigram-shingle jaccard ~= 0.17: each pair
    // shares one contiguous 10-token run inside otherwise-unique
    // 30-token docs (8 shared trigrams / 48 union). At (4,4) the
    // S-curve gives P(candidate) ~= 0.003 per pair — the default
    // demonstrably misses; the tuner at the same K=16 budget picks
    // (16,1) where P ~= 0.95.
    val docs = (1 to 12).flatMap { p =>
      val shared = (1 to 10).map(j => s"shared${p}_$j").mkString(" ")
      val ua = (1 to 20).map(j => s"ua${p}_$j").mkString(" ")
      val ub = (1 to 20).map(j => s"ub${p}_$j").mkString(" ")
      Seq((2L * p, s"$ua $shared"), (2L * p + 1, s"$shared $ub"))
    }.toDF("doc_id", "text")
    val t = 0.15
    def recallAt(bands: Int, rows: Int): (Long, Long, Double) = {
      val r = TextDedup.lshRecallAudit(docs, col("doc_id"), col("text"),
        minJaccard = t, bands = bands, rowsPerBand = rows).collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(3))
    }
    val (nExactDef, nFoundDef, recallDef) =
      recallAt(TextDedup.Bands, TextDedup.RowsPerBand)
    assert(nExactDef === 12L, s"every pair is a true near-dup: $nExactDef")
    val plan = Banding.tune(t, maxK = 16)
    val (nExactTuned, nFoundTuned, recallTuned) =
      recallAt(plan.bands, plan.rowsPerBand)
    assert(nExactTuned === nExactDef, "the exact leg is banding-independent")
    assert(recallTuned >= recallDef && nFoundTuned >= nFoundDef,
      s"tuned (${plan.bands},${plan.rowsPerBand}) recall $recallTuned must " +
        s"beat assumed (4,4) recall $recallDef")
    assert(recallTuned > 0.5,
      s"at P~=0.95 per pair the tuned plan must find most pairs: $recallTuned")
  }

  test("d3b operating report: counts consistent with the pair generator per config") {
    // the d16 corpus again: (4,4) nearly blind, (16,1) collides often
    val docs = (1 to 12).flatMap { p =>
      val shared = (1 to 10).map(j => s"shared${p}_$j").mkString(" ")
      val ua = (1 to 20).map(j => s"ua${p}_$j").mkString(" ")
      val ub = (1 to 20).map(j => s"ub${p}_$j").mkString(" ")
      Seq((2L * p, s"$ua $shared"), (2L * p + 1, s"$shared $ub"))
    }.toDF("doc_id", "text")
    val t = 0.15
    val plan = Banding.tune(t, maxK = 16)
    val rows = TextDedup.lshOperatingReport(docs, col("doc_id"), col("text"),
        minJaccard = t,
        configs = Seq(("default", TextDedup.Bands, TextDedup.RowsPerBand),
          ("tuned", plan.bands, plan.rowsPerBand)))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("default", "tuned"))
    val (db, dr, dCand, dPairs) = rows("default")
    val (tb, tr, tCand, tPairs) = rows("tuned")
    assert((db, dr) === (TextDedup.Bands, TextDedup.RowsPerBand))
    assert((tb, tr) === (plan.bands, plan.rowsPerBand))
    // every verified pair was a candidate
    assert(dPairs <= dCand && tPairs <= tCand)
    // n_pairs must equal the operating generator's own pair count
    def pairsAt(b: Int, r: Int): Long =
      TextDedup.minHashLshPairs(docs, col("doc_id"), col("text"),
        minJaccard = t, bands = b, rowsPerBand = r).count()
    assert(dPairs === pairsAt(db, dr), "default row == minHashLshPairs")
    assert(tPairs === pairsAt(tb, tr), "tuned row == minHashLshPairs")
    // the trade the report exists to expose: the recall plan pays a
    // larger (or equal) candidate bill and finds at least as many pairs
    assert(tCand >= dCand && tPairs >= dPairs)
    assert(tPairs > 0, "the tuned plan must find pairs on this corpus")
  }

  test("chooseOperating: yield-max under the candidate budget, None over it") {
    import Banding.{Operating, chooseOperating}
    val rows = Seq(
      Operating("default", 4, 4, nCandidates = 100, nPairs = 100), // bill 1.0
      Operating("tuned", 16, 1, nCandidates = 5000, nPairs = 120), // bill 41.7
      Operating("dry", 8, 2, nCandidates = 300, nPairs = 0))       // bill inf
    // generous budget: highest yield wins despite the bigger bill
    assert(chooseOperating(rows, 100.0).map(_.config) === Some("tuned"))
    // tight budget: the recall plan no longer fits, fall to default
    assert(chooseOperating(rows, 10.0).map(_.config) === Some("default"))
    // no config fits -> None, never a silent over-budget fallback
    assert(chooseOperating(rows, 0.5) === None)
    // a pair-free config can never be chosen (infinite bill)
    assert(chooseOperating(Seq(rows.last), 1e18) === None)
    // yield tie -> cheaper bill wins
    val tie = Seq(Operating("a", 4, 4, 200, 100), Operating("b", 8, 2, 150, 100))
    assert(chooseOperating(tie, 100.0).map(_.config) === Some("b"))
    // frame overload agrees with the seq form on a real report
    val docs = (1 to 6).flatMap { p =>
      val shared = (1 to 10).map(j => s"s${p}_$j").mkString(" ")
      Seq((2L * p, s"${(1 to 20).map(j => s"a${p}_$j").mkString(" ")} $shared"),
        (2L * p + 1, s"$shared ${(1 to 20).map(j => s"b${p}_$j").mkString(" ")}"))
    }.toDF("doc_id", "text")
    val report = TextDedup.lshOperatingReport(docs, col("doc_id"), col("text"),
      minJaccard = 0.15, configs = Seq(("d", 4, 4), ("t", 16, 1)))
    val viaFrame = chooseOperating(report, 1e6)
    assert(viaFrame.nonEmpty && viaFrame.get.nPairs > 0)
  }

  test("chooseOperatingOutcome separates no-pairs from over-budget") {
    import Banding.{Operating, chooseOperatingOutcome}
    val live = Seq(
      Operating("default", 4, 4, nCandidates = 100, nPairs = 100),
      Operating("tuned", 16, 1, nCandidates = 5000, nPairs = 120))
    // a fitting config -> Chosen, agreeing with the Option form
    assert(chooseOperatingOutcome(live, 100.0) ===
      Banding.Chosen(live(1)))
    // pairs exist but no bill fits -> the genuine alarm
    assert(chooseOperatingOutcome(live, 0.5) === Banding.OverBudget)
    // zero pairs in EVERY config -> nothing to dedup, NOT an alarm
    // (the +Infinity bill previously made this read as over-budget)
    val dry = Seq(
      Operating("default", 4, 4, nCandidates = 0, nPairs = 0),
      Operating("tuned", 16, 1, nCandidates = 300, nPairs = 0))
    assert(chooseOperatingOutcome(dry, 1e18) === Banding.NoPairs)
    assert(chooseOperatingOutcome(dry, 0.5) === Banding.NoPairs)
    // mixed: one config has pairs but busts the budget -> OverBudget
    // (there IS something to dedup; the plans just cost too much)
    val mixed = Seq(
      Operating("default", 4, 4, nCandidates = 0, nPairs = 0),
      Operating("tuned", 16, 1, nCandidates = 5000, nPairs = 3))
    assert(chooseOperatingOutcome(mixed, 10.0) === Banding.OverBudget)
    // an EMPTY measurement set is a caller bug, never "NoPairs" (the
    // vacuous-forall trap): fail fast instead of silently keeping the
    // plan on the strength of zero measurements
    intercept[IllegalArgumentException] {
      chooseOperatingOutcome(Seq.empty, 10.0)
    }
  }

  test("fused multi-config report rows equal single-config reports") {
    // the fused plan (one union self-join + one verify, per-config
    // membership recomputed from signature slices) must reproduce the
    // per-config computation EXACTLY — both counts, every config,
    // including a deep-row config that finds nothing on this corpus
    val docs = (1 to 10).flatMap { p =>
      val shared = (1 to 12).map(j => s"sh${p}_$j").mkString(" ")
      Seq((2L * p, s"${(1 to 18).map(j => s"a${p}_$j").mkString(" ")} $shared"),
        (2L * p + 1, s"$shared ${(1 to 18).map(j => s"b${p}_$j").mkString(" ")}"))
    }.toDF("doc_id", "text")
    val configs = Seq(("d", 4, 4), ("t", 15, 1), ("m", 8, 2), ("deep", 1, 16))
    def rowsOf(cs: Seq[(String, Int, Int)]) =
      TextDedup.lshOperatingReport(docs, col("doc_id"), col("text"),
          minJaccard = 0.15, configs = cs)
        .collect().map(r => r.getString(0) ->
          (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    val fused = rowsOf(configs)
    assert(fused.keySet === configs.map(_._1).toSet,
      "every config keeps its row, zero-candidate configs included")
    for (c @ (n, _, _) <- configs)
      assert(fused(n) === rowsOf(Seq(c))(n),
        s"fused row for $n must equal its single-config report")
  }
}
