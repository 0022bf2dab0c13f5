package graft.dedup

/** MinHash banding parameter tuner — closes the loop d16 measures:
  * instead of ASSUMING (bands, rowsPerBand), derive them from the
  * dedup threshold by minimizing the weighted false-positive +
  * false-negative area of the S-curve `P(candidate | s) =
  * 1 - (1 - s^r)^b` (the standard LSH analysis, e.g. Leskovec/
  * Rajaraman/Ullman "Mining of Massive Datasets" §3.4; the same
  * integral-minimization procedure the public datasketch library
  * popularized — re-derived here from the math, not ported):
  *
  *   fp(t,b,r) = ∫₀ᵗ P(candidate|s) ds   (pairs below threshold that
  *                                         still collide → verify cost)
  *   fn(t,b,r) = ∫ₜ¹ 1 - P(candidate|s) ds (true pairs banding misses
  *                                         → lost recall)
  *
  * `tune` scans every (b, r) with b·r ≤ maxK and returns the argmin of
  * `fpWeight·fp + fnWeight·fn`. Pure driver-side arithmetic — nothing
  * here touches a DataFrame; the chosen plan feeds
  * [[TextDedup.minHashLshPairs]]' `bands`/`rowsPerBand` knobs.
  *
  * Weighting intuition: fnWeight ↑ favors small r / large b (recall —
  * the dedup stance: a missed near-dup ships a duplicate into
  * training); fpWeight ↑ favors large r (precision — candidate volume
  * is the verify-join's cost, the 100 TB concern).
  */
object Banding {

  /** Probability two docs at Jaccard `s` share at least one band. */
  def candidateProb(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand.toDouble), bands.toDouble)

  /** (fpArea, fnArea) for a threshold, by midpoint quadrature —
    * deterministic (fixed `points`, plain double sums in index
    * order). */
  def errorAreas(threshold: Double, bands: Int, rowsPerBand: Int,
                 points: Int = 1000): (Double, Double) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1), got $threshold")
    var fp = 0.0
    var i = 0
    val wFp = threshold / points
    while (i < points) {
      fp += candidateProb((i + 0.5) * wFp, bands, rowsPerBand) * wFp
      i += 1
    }
    var fn = 0.0
    val wFn = (1.0 - threshold) / points
    i = 0
    while (i < points) {
      fn += (1.0 - candidateProb(threshold + (i + 0.5) * wFn,
        bands, rowsPerBand)) * wFn
      i += 1
    }
    (fp, fn)
  }

  /** A tuned banding choice with its predicted error areas. */
  final case class Plan(bands: Int, rowsPerBand: Int,
                        fpArea: Double, fnArea: Double, error: Double) {
    def k: Int = bands * rowsPerBand
  }

  /** Scan every (b, r) with b·r ≤ `maxK` and return the weighted-error
    * argmin (ties break toward fewer signatures, then more bands —
    * deterministic). `maxK` is the signature budget: the only cost a
    * bigger K adds is K affine remixes per doc, so budget ≈ how much
    * map-side work the signature pass may spend.
    *
    * `maxK` is capped at [[graft.dedup.TextDedup.MinHashPoolA]]'s size
    * (64): the extended MinHash pools the signature pass draws from
    * stop there, so a plan tuned past the pool would only fail later —
    * far from the misconfiguration — at pair-generation time. Failing
    * fast here keeps the error at the tune call. */
  def tune(threshold: Double, maxK: Int,
           fpWeight: Double = 0.5, fnWeight: Double = 0.5,
           points: Int = 1000): Plan = {
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    require(maxK <= graft.dedup.TextDedup.MinHashPoolA.size,
      s"maxK must be <= ${graft.dedup.TextDedup.MinHashPoolA.size} " +
        s"(the MinHash pool size — a larger plan cannot be executed " +
        s"by minHashLshPairs), got $maxK")
    require(fpWeight >= 0 && fnWeight >= 0 && fpWeight + fnWeight > 0,
      "weights must be non-negative and not both zero")
    val plans = for {
      r <- 1 to maxK
      b <- 1 to maxK / r
    } yield {
      val (fp, fn) = errorAreas(threshold, b, r, points)
      Plan(b, r, fp, fn, fpWeight * fp + fnWeight * fn)
    }
    plans.minBy(p => (p.error, p.k, -p.bands))
  }

  /** One measured operating row of
    * [[TextDedup.lshOperatingReport]] — config label, plan, and the
    * measured candidate/pair counts on the actual corpus. */
  final case class Operating(config: String, bands: Int, rowsPerBand: Int,
                             nCandidates: Long, nPairs: Long) {
    /** The verify-join bill per verified pair — the number that grows
      * super-linearly for low-r plans as the corpus grows (measured:
      * 17.8 → 331 over a 20× spread for (15,1) at t=0.1, SCALING.md
      * r14). Pair-free configs price at +∞ (they bought nothing). */
    def candidatesPerPair: Double =
      if (nPairs == 0L) Double.PositiveInfinity
      else nCandidates.toDouble / nPairs.toDouble
  }

  /** The typed outcome of [[chooseOperatingOutcome]] — a plain None
    * cannot distinguish "every config is over budget" (raise
    * rowsPerBand / compose the df-cap / raise the budget) from "the
    * corpus simply has no near-dups at this threshold" (keep the
    * committed plan; there is nothing to reband FOR), and the two
    * demand opposite operator responses. */
  sealed trait Choice
  /** A config fit the budget; `op` is the yield-max winner. */
  final case class Chosen(op: Operating) extends Choice
  /** Every measured config yielded ZERO pairs — nothing to dedup at
    * this threshold, so no plan is better than any other and the
    * committed plan stands. NOT an alarm condition. */
  case object NoPairs extends Choice
  /** Pairs exist but every config's candidates-per-pair bill exceeds
    * the budget — the genuine alarm: shipping any of these plans
    * ships the blowup the report exists to prevent. */
  case object OverBudget extends Choice

  /** Close the operating loop: given the MEASURED report rows, pick
    * the config with the highest pair yield whose candidates-per-pair
    * bill fits `maxCandidatesPerPair` (ties → cheaper bill, then the
    * S-curve order: fewer signatures, more bands). This is the
    * decision [[tune]]'s a-priori integral cannot make — the integral
    * prices collision PROBABILITY, but the bill depends on the
    * corpus's actual similarity mass, which only the report sees
    * (the SCALING.md r14 lesson: a recall plan's bill grows
    * super-linearly while its yield grows linearly, so the right
    * config CHANGES as the corpus grows).
    *
    * A zero-pair config prices at +∞ (it bought nothing), so on a
    * corpus with no near-dups EVERY config is over any finite budget —
    * which is a false alarm, not an over-budget condition. The typed
    * outcome separates the two: [[NoPairs]] when no config found any
    * pair (keep the committed plan), [[OverBudget]] when pairs exist
    * but every bill busts the budget (the caller's cue to raise
    * `rowsPerBand`, compose the df-cap, or raise the budget). */
  def chooseOperatingOutcome(rows: Seq[Operating],
                             maxCandidatesPerPair: Double): Choice = {
    require(maxCandidatesPerPair > 0, "budget must be positive")
    // an empty measurement set must not read as "nothing to dedup"
    // (forall over Nil is vacuously true): zero measurements is a
    // caller bug, not a corpus finding
    require(rows.nonEmpty, "chooseOperatingOutcome needs at least one " +
      "measured operating row")
    rows.filter(_.candidatesPerPair <= maxCandidatesPerPair) match {
      case Seq() =>
        if (rows.forall(_.nPairs == 0L)) NoPairs else OverBudget
      case fits => Chosen(fits.minBy(o =>
        (-o.nPairs, o.candidatesPerPair, o.bands * o.rowsPerBand, -o.bands)))
    }
  }

  /** [[chooseOperatingOutcome]] flattened to an Option — Some only
    * when a config fit the budget (both no-pairs and over-budget read
    * None; use the outcome form when the distinction matters). */
  def chooseOperating(rows: Seq[Operating],
                      maxCandidatesPerPair: Double): Option[Operating] =
    chooseOperatingOutcome(rows, maxCandidatesPerPair) match {
      case Chosen(op) => Some(op)
      case _ => None
    }

  /** A report frame's rows as [[Operating]]s (collects the
    * configs-sized rows — control-plane, never corpus-sized). */
  def operatingRows(report: org.apache.spark.sql.DataFrame): Seq[Operating] =
    report.select("config", "bands", "rows_per_band",
        "n_candidates", "n_pairs")
      .collect().toSeq.map(r => Operating(r.getString(0), r.getInt(1),
        r.getInt(2), r.getLong(3), r.getLong(4)))

  /** [[chooseOperating]] straight off the report frame. */
  def chooseOperating(report: org.apache.spark.sql.DataFrame,
                      maxCandidatesPerPair: Double): Option[Operating] =
    chooseOperating(operatingRows(report), maxCandidatesPerPair)

  /** [[chooseOperatingOutcome]] straight off the report frame. */
  def chooseOperatingOutcome(report: org.apache.spark.sql.DataFrame,
                             maxCandidatesPerPair: Double): Choice =
    chooseOperatingOutcome(operatingRows(report), maxCandidatesPerPair)
}
