package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic hash-based splitting and sampling for training-data
  * pipelines.
  *
  * All assignment comes from md5 of a stable key (see
  * [[graft.functions.Hashing.h32]]) rather than `rand()`: the same row
  * always lands in the same split/sample, regardless of partitioning,
  * retries, or corpus growth — the property a train/val split must have
  * under incremental appends (reference analog: the deterministic
  * keying discipline of NBclaims_silver.py:160-166's stable hashed ids).
  * Everything here is a map-only column expression — at 100 TB these
  * run at scan speed with zero shuffles.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from md5 of the key. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    Hashing.h32(key.cast("string")) % buckets

  /** Fraction resolution for [[sampleFraction]]/[[stratifiedSample]]:
    * fractions quantize to millionths, so a 0.001 sample keeps 0.1% of
    * rows rather than rounding to the nearest whole percent. */
  val FractionBuckets = 1000000

  /** Train/val/test split by hash bucket: `trainPct` buckets go to
    * train, the next `valPct` to val, the remainder to test. */
  def withSplit(df: DataFrame, key: Column,
                trainPct: Int = 90, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(key)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Dedup-aware (cluster-atomic) split — the leakage-FREE carve x9
    * and [[splitLeakageAudit]] exist to enable: near-duplicate docs
    * must land in ONE split (Lee et al. 2021's finding that
    * cross-split near-dups inflate eval), so the split key is the
    * doc's near-dup COMPONENT (`clusters` — d7's (doc_id, cluster_id)
    * shape from any pair generator; docs in no cluster key on
    * themselves). Same md5 bucket discipline as [[withSplit]]: the
    * assignment reproduces under retries, repartitioning, and corpus
    * growth — and a cluster that GROWS keeps its split as long as its
    * min-id representative is stable (the cluster-id contract).
    * Output: (doc_id, grp, split); feed it straight to
    * [[splitLeakageAudit]], whose `leaked` rows are empty by
    * construction. One broadcast-able equi-join (clusters is
    * dup-docs-sized, far below the corpus) + the map-only split. */
  def dedupSplit(docs: DataFrame, id: Column, clusters: DataFrame,
                 trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val assigned = docs.select(id.as("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("cluster_id"), col("doc_id")))
    withSplit(assigned, col("grp"), trainPct, valPct)
      .select("doc_id", "grp", "split")
  }

  /** Split-leakage audit — the measurement x9's grouped split exists
    * to zero out (Lee et al. 2021 §6.2 measured benchmark-corpus
    * near-dups straddling published train/test splits; any per-doc
    * hash split leaves the same hole when near-duplicate content
    * rides both sides): given a near-dup pair set and a split
    * assignment, count pairs per unordered split combination. The
    * off-diagonal rows (`leaked = true`) are memorization leaks — a
    * model can score test docs it effectively saw in train. Run it
    * BEFORE training: a nonzero train/test row means re-split by
    * group or scrub with `d6`-style drops first.
    *
    * Inputs: `pairs` (doc_a, doc_b) — any pair generator (d2/d3/d4/
    * d5's outputs all qualify); `assignment` (doc_id, split) —
    * [[withSplit]]'s shape. Two keyed equi-joins + one tiny rollup;
    * pair labels are canonicalized (least/greatest) so train/test and
    * test/train land in ONE row. */
  def splitLeakageAudit(pairs: DataFrame, assignment: DataFrame): DataFrame = {
    val a = assignment.select(col("doc_id").as("doc_a"),
      col("split").as("__sa"))
    val b = assignment.select(col("doc_id").as("doc_b"),
      col("split").as("__sb"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .groupBy(least(col("__sa"), col("__sb")).as("split_lo"),
        greatest(col("__sa"), col("__sb")).as("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaked", col("split_lo") =!= col("split_hi"))
  }

  /** Deterministic per-EPOCH ordering key: md5 of (epoch, key) — the
    * shard-shuffle a training loop runs every epoch without `rand()`.
    * Each epoch induces a different but fully reproducible permutation
    * (same rows, same order, under retries/re-partitioning/appends);
    * ties (hash collisions) break on the key downstream. Map-only: the
    * sort itself belongs to the shard WRITER (one per-shard sort, the
    * same work a deterministic shard file needs anyway), not here. */
  def epochOrderKey(key: Column, epoch: Int): Column =
    Hashing.h32(concat_ws(":", lit(epoch.toString), key.cast("string")))

  /** Stride-scheduled stratum interleave — the deterministic TRAINING
    * ORDER for a mixed corpus ([[mix]] says how MUCH of each stratum;
    * this says in WHAT ORDER): every stratum advances through the
    * global order at a rate proportional to its share, so ANY prefix
    * of the sorted order holds each stratum in ≈ its share — the
    * anti-curriculum guarantee (sorting a mixed corpus by id or
    * source silently trains 3 epochs of one feed before the first doc
    * of another; an interleaved order never does). Classic stride
    * scheduling (Waldspurger & Weihl 1995, lottery/stride CPU
    * scheduling): the stratum's p-th item (1-based, per-epoch
    * deterministic order via [[epochOrderKey]]) gets
    * `order_key = (p − 0.5) / share`; consumers sort by
    * (order_key, stratum, id) — the tiebreak makes the order total.
    * Shares are each stratum's natural corpus share, so every prefix
    * looks like the corpus; to interleave a REWEIGHTED mixture, apply
    * [[mix]] first and interleave its output (copies carry copy_id
    * into the id, so they spread across the epoch too).
    *
    * Scale: shares are one partial-aggregated strata-sized count
    * broadcast back; positions are ONE window partitioned by stratum
    * ordered by the epoch key — the same per-partition sort a
    * deterministic shard writer pays anyway (t7's argument); the
    * order KEY is emitted, never a global sort (the shard writer's
    * range partitioner consumes it). Determinism: share and order_key
    * are two IEEE divisions in fixed order from exact longs — any
    * engine replays them bit for bit. */
  def strideInterleave(df: DataFrame, id: Column, stratum: Column,
                       epoch: Int = 0): DataFrame = {
    val base = df.select(id.as("doc_id"), stratum.as("stratum"))
    val counts = base.groupBy("stratum").agg(count(lit(1)).as("__n"))
    val tot = counts.agg(sum(col("__n")).as("__tot"))
    val shares = counts.crossJoin(broadcast(tot))
      .select(col("stratum"),
        (col("__n").cast("double") / col("__tot").cast("double")).as("__w"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(epochOrderKey(col("doc_id"), epoch), col("doc_id"))
    base.withColumn("pos", row_number().over(w).cast("long"))
      .join(broadcast(shares), "stratum")
      .select(col("doc_id"), col("stratum"), col("pos"),
        ((col("pos").cast("double") - 0.5) / col("__w")).as("order_key"))
  }

  /** Keep a deterministic `fraction` of rows
    * (hash bucket < [[FractionBuckets]]·f, millionth granularity). */
  def sampleFraction(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"invalid fraction $fraction")
    df.filter(hashBucket(key, FractionBuckets) <
      math.round(fraction * FractionBuckets).toInt)
  }

  /** Deterministic UPsampling — the other half of a mixture recipe:
    * repeat every row floor(factor) times, plus one more copy for the
    * hash-selected `factor mod 1` fraction of keys. Emits a `copy_id`
    * (0-based) so downstream shuffles/packing can tell copies apart.
    * Map-only fan-out (sequence + explode): no shuffle, deterministic
    * under retries — epochs-style oversampling of a high-quality
    * source reproduces exactly. */
  def upsample(df: DataFrame, key: Column, factor: Double): DataFrame = {
    require(factor >= 1.0, s"upsample factor must be >= 1, got $factor")
    val whole = math.floor(factor).toInt
    val fracCut = math.round((factor - whole) * FractionBuckets).toInt
    val copies = when(hashBucket(key, FractionBuckets) < fracCut, whole)
      .otherwise(whole - 1)
    df.withColumn("copy_id", explode(sequence(lit(0), copies)))
  }

  /** EXACTLY k rows per stratum, deterministically: the k keys with
    * the smallest md5 hashes in each group (ties on the key itself).
    * The fixed-size counterpart of [[stratifiedSample]] — eval-set
    * carving ("exactly 10k docs per language") needs a count, not a
    * fraction. Same stability contract: a key's membership changes
    * only if a smaller-hashed key enters its stratum, so samples drift
    * minimally (k-minwise) under corpus growth instead of reshuffling.
    *
    * Scale shape: one partial-aggregating pass with the bounded-heap
    * [[graft.functions.TopKPairs]] — each map partition ships at most
    * k candidates per stratum, where the naive
    * `row_number().over(partitionBy(stratum).orderBy(hash))` form
    * shuffles and sorts EVERY row. Output: (stratum, key) rows,
    * k per stratum (fewer if the stratum is smaller than k). */
  def exactKPerStratum(df: DataFrame, stratum: Column, key: Column,
                       k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.graft.ColumnBridge
    // TopKPairs keeps the LARGEST (sim, id) pairs under (sim desc, id
    // asc); negate the hash so "largest" means smallest-hash-first,
    // with equal hashes resolved to the smaller key — the same total
    // order as ORDER BY hash, key
    val ranked = struct(
      (-Hashing.h32(key.cast("string"))).cast("double"),
      key.cast("long"))
    val top = ColumnBridge.column(graft.functions.TopKPairs(
      ColumnBridge.expression(ranked), k).toAggregateExpression())
    df.groupBy(stratum.as("stratum"))
      .agg(top.as("top"))
      .select(col("stratum"), explode(col("top.id")).as("kept_id"))
  }

  /** Full mixture recipe in one pass: every stratum gets a weight —
    * below 1.0 down-samples (a hash-selected fraction of keys keeps one
    * copy), above 1.0 over-samples ([[upsample]]'s whole-copies-plus-
    * fractional-extra shape) — so "2.5 epochs of wiki, half of crawl,
    * everything else once" is a single map-only explode instead of a
    * filter leg unioned with an upsample leg. Emits `copy_id` (0-based)
    * per surviving copy; weight-0 strata drop entirely. Same md5
    * determinism contract as [[withSplit]]: the recipe reproduces
    * exactly under retries, repartitioning, and corpus growth, and the
    * down-sample keeps the SAME keys [[sampleFraction]] would keep.
    * Zero shuffles at any scale. */
  def mix(df: DataFrame, key: Column, stratum: Column,
          weights: Map[String, Double], default: Double = 1.0): DataFrame = {
    require((weights.values.toSeq :+ default).forall(_ >= 0),
      "mixture weights must be >= 0")
    val b = hashBucket(key, FractionBuckets)
    def copiesFor(w: Double): Column = {
      val whole = math.floor(w).toInt
      val fracCut = math.round((w - whole) * FractionBuckets).toInt
      when(b < fracCut, whole + 1).otherwise(whole)
    }
    val copies = weights.foldLeft(copiesFor(default)) {
      case (els, (value, w)) => when(stratum === value, copiesFor(w)).otherwise(els)
    }
    // sequence(0, -1) would count DOWN; empty array -> explode drops the row
    df.withColumn("copy_id",
      explode(when(copies > 0, sequence(lit(0), copies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Temperature-scaled mixture weights — the exponent-smoothed
    * sampling recipe of multilingual pretraining (Conneau & Lample
    * 2019 "Cross-lingual Language Model Pretraining" §3.1; the same
    * `p^α / Σ p^α` smoothing mBERT and XLM-R use): raising each
    * stratum's natural share to α < 1 and renormalizing boosts
    * low-resource strata without flattening the mixture entirely.
    * Output per stratum: count, natural share, temperature share, and
    * the boost factor (`p_temp / p_natural` — the weight to feed
    * [[mix]] as that stratum's epoch multiplier).
    *
    * Determinism: the only cross-row float reduction (Σ p^α) would be
    * summation-order-sensitive in IEEE doubles, so each p^α is rounded
    * to 9 dp and summed as DECIMAL(38,9) — exact in any order, engine
    * identical. α = 0.5 (the common default) is computed via `sqrt`,
    * which IEEE 754 requires to be correctly rounded; other exponents
    * go through `pow`, correct to ~1 ulp (inside the 9-dp round except
    * at knife edges). Cost: one partial-aggregated count shuffle over
    * strata-sized data, two one-row broadcast attaches — free at any
    * corpus size. */
  def temperatureWeights(df: DataFrame, stratum: Column,
                         alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
    // Σ n and Σ p^α as unpartitioned window sums over the |strata|
    // frame — the one-row-aggregate-attach form re-executed the corpus
    // groupBy per branch (pruning defeats exchange reuse); both sums
    // stay exact (long / decimal(38,9)) so values are unchanged
    val wAll = Window.partitionBy()
    val pa = if (alpha == 0.5) sqrt(col("__p")) else pow(col("__p"), lit(alpha))
    counts
      .withColumn("__p", col("n_docs").cast("double") /
        sum(col("n_docs")).over(wAll).cast("double"))
      .withColumn("__pa", round(pa, 9).cast("decimal(38,9)"))
      .withColumn("__q", col("__pa").cast("double") /
        sum(col("__pa")).over(wAll).cast("double"))
      .select(col("stratum"), col("n_docs"),
        // §6 quantizer on the share/boost quotients (Quantize
        // scaladoc): engine-identical at the half boundary
        graft.functions.Quantize.qdp(col("__p"), 6).as("p_natural"),
        graft.functions.Quantize.qdp(col("__q"), 6).as("p_temp"),
        graft.functions.Quantize.qdp(col("__q") / col("__p"), 6).as("boost"))
  }

  /** Token-budget mixture allocation — the epoch "data recipe" solver
    * (how pretraining mixtures are actually sized: "B tokens this
    * epoch, mixed ∝ these weights"): allocate `budget` tokens across
    * sources proportionally to `weight`, capping every source at its
    * token `capacity` and re-distributing the freed budget over the
    * uncapped rest — proportional water-filling (max-min fairness
    * under caps; the allocation every published mixture with an
    * epoch-cap column, e.g. LLaMA's table 1, implies).
    *
    * Closed form, no iteration: sort sources by capacity/weight
    * ascending. The capped set is always a PREFIX of that order, and
    * source i caps iff `ratio_i ≤ (B − Σ_{j<i} c_j)/(W − Σ_{j<i} w_j)`
    * — the water level computed as if the whole earlier prefix were
    * capped (exact on the true capped prefix; strictly BELOW the true
    * level past it, so no false cap — the standard prefix argument).
    * One window pass over the SOURCES-sized frame decides everything;
    * uncapped sources get `λ_final · w`, the level left after the
    * capped prefix. Budgets above total capacity saturate (every
    * source capped).
    *
    * Determinism: capacities are exact longs, weights sum as
    * DECIMAL(38,9); ratio and level round to 9 dp before the ordering
    * and the ≤ compare; λ_final is one IEEE division and each
    * allocation one multiply + 6-dp round — engine-identical.
    *
    * Weight contract: weights must be non-negative and non-null
    * (enforced in-plan — a violating row raises at execution, no
    * driver collect). Weight 0 means "allocate nothing": the source is
    * excluded from the solve and reports capped = false,
    * allocation = 0 (it is NOT handed its capacity when the budget
    * exceeds the positive-weight capacity).
    *
    * Output per source: capacity, weight (echo), `capped`,
    * `allocation` (tokens, 6 dp), `sample_rate` (allocation /
    * capacity, 6 dp). */
  /** The §6 presentation quantizer (see [[graft.functions.Quantize]]):
    * engine-identical at any magnitude, unlike round(double, n) or a
    * double→decimal cast. */
  private def qdp(c: Column, dp: Int): Column =
    graft.functions.Quantize.qdp(c, dp)

  def budgetMix(perSource: DataFrame, stratum: Column, capacity: Column,
                weight: Column, budget: Column): DataFrame = {
    val wAll = Window.partitionBy()
    val ord = Window.partitionBy()
      .orderBy(col("ratio"), col("stratum"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // weight contract, enforced IN-PLAN (distributed fail-fast — no
    // driver-side collect): null or negative weights raise; weight 0
    // (including positives that quantize to 0 at the 9-dp resolution)
    // means "allocate nothing" — the row is excluded from the solve
    // (it contributes 0 to the weight mass, sorts to the suffix with
    // ratio = +Inf/NaN, and is forced uncapped with allocation 0), it
    // is never handed its capacity. Without the exclusion a
    // zero-weight row's +Inf ratio could satisfy Inf <= Inf when the
    // budget exceeds the positive-weight capacity and be "capped" at
    // its FULL capacity — the opposite of what weight 0 means.
    val wIn = weight.cast("double")
    val wChecked = when(wIn.isNull || wIn < 0, raise_error(concat(
      lit("budgetMix: weight must be non-negative, got "),
      coalesce(wIn.cast("string"), lit("null")),
      lit(" for stratum "), stratum.cast("string")))).otherwise(wIn)
    // weights are consumed at 9-dp resolution: ONE early decimal
    // quantization (exact for |w| ≤ 1-ish values in any engine — the
    // double's ulp is far below 5e-10 there) breaks the 16-digit
    // derived-double chain; every later step is exact decimal/long
    // arithmetic or a single IEEE op on identical operands, so the
    // whole solve is engine-reproducible at any corpus magnitude
    val base = perSource.select(stratum.as("stratum"),
      capacity.cast("long").as("capacity"),
      wChecked.cast("decimal(18,9)").as("weight"))
      // ratio/level/allocation grow with corpus size, where a
      // double→decimal cast's semantics (shortest-repr vs binary)
      // collide with the double's ulp — so they quantize via
      // floor(x·10^dp + 0.5)/10^dp: pure IEEE ops on an identical
      // double give an identical result in any engine at any scale
      // (values are non-negative, so +0.5/floor IS half-up).
      // Weights and rates are bounded by 1, where the decimal-cast
      // recipe is exact — they keep it.
      // weight-0 rows get a literal +Inf ratio (ANSI mode raises on a
      // zero divisor, and +Inf sorts AFTER every finite ratio — the
      // exclusion relies on zero-weight rows living in the suffix)
      .withColumn("ratio",
        when(col("weight") > 0,
          qdp(col("capacity").cast("double") /
            col("weight").cast("double"), 9))
          .otherwise(lit(Double.PositiveInfinity)))
      .withColumn("__B",
        // clamp to [0, Σcapacity]: a negative budget must allocate
        // nothing, not negative tokens
        greatest(least(budget.cast("long"),
          sum(col("capacity")).over(wAll)), lit(0L)))
      .withColumn("__W", sum(col("weight")).over(wAll))
      .withColumn("__cumC", coalesce(sum(col("capacity")).over(ord), lit(0L)))
      .withColumn("__cumW", coalesce(sum(col("weight")).over(ord),
        lit(0).cast("decimal(18,9)")))
      // the remaining weight is > 0 for every positive-weight row (its
      // own weight is still in the suffix); it reaches 0 only on
      // zero-weight rows, whose level is never read (capped is forced
      // false there) — null it instead of dividing by zero under ANSI
      .withColumn("__level",
        when(col("__W") - col("__cumW") > 0, qdp(
          (col("__B") - col("__cumC")).cast("double") /
            (col("__W") - col("__cumW")).cast("double"), 9))
          .otherwise(lit(null).cast("double")))
      // weight-0 rows are OUT of the solve: never capped (their +Inf
      // ratio must not win an Inf <= Inf compare), never allocated
      .withColumn("capped",
        col("weight") > 0 && col("ratio") <= col("__level"))
    // λ_final over the capped prefix; when everything capped (budget
    // ≥ capacity) the remaining weight is 0 — no uncapped row reads it
    val lambda =
      (col("__B") - sum(when(col("capped"), col("capacity"))
        .otherwise(lit(0L))).over(wAll)).cast("double") /
      (col("__W") - sum(when(col("capped"), col("weight"))
        .otherwise(lit(0).cast("decimal(18,9)"))).over(wAll)).cast("double")
    base
      .withColumn("allocation",
        // weight 0 allocates 0 BEFORE the λ path: when every weight is
        // 0, λ is 0/0 = NaN and NaN·0 would poison the product
        when(col("weight") <= 0, lit(0.0))
          .when(col("capped"), col("capacity").cast("double"))
          .otherwise(qdp(lambda * col("weight").cast("double"), 6)))
      .select(col("stratum"), col("capacity"),
        round(col("weight"), 6).cast("double").as("weight"),
        col("capped"),
        col("allocation"),
        // a zero-capacity source has no meaningful rate (and ANSI
        // raises on the 0/0) — report null, not NaN
        when(col("capacity") > 0,
          qdp(col("allocation") / col("capacity").cast("double"), 6))
          .otherwise(lit(null).cast("double"))
          .as("sample_rate"))
  }

  /** [[budgetMix]] with the budget given as a fraction of total
    * capacity — computed in-plan (`floor(frac · Σcapacity)`), so no
    * driver-side pre-count is needed. The budget expression references
    * the core's renamed `capacity` column (evaluated post-projection,
    * which is the core's documented contract for the budget column). */
  def budgetMix(perSource: DataFrame, stratum: Column, capacity: Column,
                weight: Column, budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0, s"budgetFrac must be positive, got $budgetFrac")
    val total = sum(col("capacity")).over(Window.partitionBy())
    budgetMix(perSource, stratum, capacity, weight,
      floor(total.cast("double") * lit(budgetFrac)).cast("long"))
  }

  /** Per-stratum deterministic sampling (data mixing): rows whose
    * `stratum` value appears in `fractions` keep that fraction,
    * everything else keeps `default`. Upsampling beyond 1.0 is out of
    * scope — this is the down-mixing half of a mixture recipe. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       fractions: Map[String, Double],
                       default: Double): DataFrame = {
    require((fractions.values.toSeq :+ default).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val cut = fractions.foldLeft(lit(math.round(default * FractionBuckets).toInt)) {
      case (els, (value, f)) =>
        when(stratum === value, lit(math.round(f * FractionBuckets).toInt)).otherwise(els)
    }
    df.filter(hashBucket(key, FractionBuckets) < cut)
  }

  /** Temporal holdout split — the anti-leakage split for anything with
    * a time axis (forecasting, recommendation, event models), where
    * x1's hash split would leak the future into training: the last
    * `1 - trainFrac` of the data's OWN time span becomes the test set.
    * The boundary is derived from min/max event time (one
    * partial-aggregating pass to ONE row, broadcast back — the
    * constant-side product class), classification is map-only.
    * Boundary arithmetic is IEEE double over epoch micros (exact
    * integers far below 2^53) with a final floor — every engine
    * computes the identical boundary.
    *
    * Output: one summary row per split (n, n_keys, min/max ts). For
    * the assignment itself, compose the same boundary with a
    * when/otherwise label column. */
  def temporalSplit(df: DataFrame, ts: Column, key: Column,
                    trainFrac: Double = 0.9): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1, "trainFrac must be in (0,1)")
    val b = df.agg(min(unix_micros(ts)).as("__lo"), max(unix_micros(ts)).as("__hi"))
      .select(floor(col("__lo") +
        (col("__hi") - col("__lo")) * lit(trainFrac)).cast("long").as("__b"))
    df.select(ts.as("__ts"), key.as("__key"))
      .crossJoin(broadcast(b))
      .withColumn("split",
        when(unix_micros(col("__ts")) < col("__b"), "train").otherwise(lit("test")))
      .groupBy("split")
      .agg(count(lit(1)).as("n"), countDistinct(col("__key")).as("n_keys"),
        min(col("__ts")).as("min_ts"), max(col("__ts")).as("max_ts"))
  }
}
