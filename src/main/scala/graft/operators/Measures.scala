package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.Quantize.qdp

/** The semantic-model measure pack, re-expressed as Spark aggregations.
  *
  * Source of truth: the reference's DAX measures
  * (fabric/claims/Semantic and Reports/SM_Claims.SemanticModel/definition/
  * tables/Claims.tmdl): COUNTROWS, SUM, AVERAGE, DISTINCTCOUNT,
  * CALCULATE(status/type filter), DIVIDE rates, and the Time
  * Intelligence folder (TOTALYTD/QTD/MTD, SAMEPERIODLASTYEAR, YoY %).
  *
  * Determinism note (oracle gate): SUM over DOUBLE is order-dependent,
  * and Spark's partial-aggregation order is not the oracle's. All money
  * sums therefore go through DECIMAL(18,4) — exact, associative, equal
  * in any engine — and are surfaced as DOUBLE (exact conversion).
  */
object Measures {

  /** Exact, engine-independent sum of a double column. */
  def decSum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact mean: decimal sum / count, one IEEE division. */
  def decAvg(c: Column): Column = decSum(c) / count(c)

  /** CALCULATE([measure], col = v): the conditional-aggregate idiom. */
  def countWhere(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))
  def sumWhere(c: Column, cond: Column): Column =
    sum(when(cond, c).otherwise(lit(null)).cast(DecimalType(18, 4))).cast(DoubleType)

  /** The flat measure pack over a claims-like feed: one row of KPIs.
    * Roles: amount (ClaimAmount), status (ClaimStatus), typ (ClaimType),
    * entityA/entityB (PatientID/ProviderID distinct counts).
    * statuses = (approved, denied, pending) analog values.
    * types = (label, value) pairs — one CALCULATE-by-type count per
    * entry, named `<label>_claims` (the reference defines five:
    * Inpatient/Outpatient/Emergency/Routine/Urgent Care,
    * Claims.tmdl:189-225). One aggregation pass regardless of how many
    * types — every extra measure is another partial-aggregated
    * conditional sum, not another job. */
  def measurePack(df: DataFrame, amount: Column, status: Column, typ: Column,
                  entityA: Column, entityB: Column,
                  statuses: (String, String, String),
                  types: Seq[(String, String)]): DataFrame = {
    val (app, den, pen) = statuses
    val base = Seq(
      decSum(amount).as("total_amount"),
      decAvg(amount).as("average_amount"),
      countDistinct(entityA).as("unique_patients"),
      countDistinct(entityB).as("unique_providers"),
      countWhere(status === app).as("approved_claims"),
      countWhere(status === den).as("denied_claims"),
      countWhere(status === pen).as("pending_claims"),
      sumWhere(amount, status === app).as("approved_amount"),
      sumWhere(amount, status === den).as("denied_amount"),
      sumWhere(amount, status === pen).as("pending_amount"))
    val byType = types.map { case (label, value) =>
      countWhere(typ === value).as(s"${label}_claims")
    }
    val rates = Seq(
      (countWhere(status === app).cast(DoubleType) / count(lit(1))).as("approval_rate"),
      (countWhere(status === den).cast(DoubleType) / count(lit(1))).as("denied_rate"),
      (countWhere(status === pen).cast(DoubleType) / count(lit(1))).as("pending_rate"))
    df.agg(count(lit(1)).as("total_claims"), base ++ byType ++ rates: _*)
  }

  /** Sketch form of the distinct-count measures: HyperLogLog++
    * `approx_count_distinct` (Heule et al. 2013) instead of exact
    * `countDistinct`. At 100 TB the exact form shuffles every distinct
    * value to a reducer; the sketch form shuffles one fixed-size
    * register array per partition, so its cost is flat in cardinality.
    * Same row/column contract as the exact pair in [[measurePack]];
    * `rsd` is the target relative standard deviation. Spark's HLL++ is
    * deterministic for fixed inputs, but NOT reproducible by other
    * engines — so this is spec-gated against the exact counts (within
    * 3·rsd) rather than oracle-hashed. */
  def approxDistinctPack(df: DataFrame, entityA: Column, entityB: Column,
                         rsd: Double = 0.02): DataFrame =
    df.agg(
      approx_count_distinct(entityA, rsd).as("unique_patients"),
      approx_count_distinct(entityB, rsd).as("unique_providers"))

  /** Sketch form of the percentile measures: Greenwald–Khanna
    * `approx_percentile` (2001) instead of the exact interpolated form
    * — the exact form sorts every group's values; the sketch keeps a
    * bounded summary per partition and merges. `accuracy` bounds rank
    * error at 1/accuracy of the group size. Deterministic for fixed
    * input but not cross-engine — spec-gated against the exact
    * percentiles, rows-only at the driver like [[approxDistinctPack]]. */
  def approxPercentiles(df: DataFrame, group: Column, value: Column,
                        probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    // p50 / p99 / p99_5 — decimal digits keep close probs (0.995 vs
    // 0.999) from colliding into one output name
    def pname(p: Double) = "p" + BigDecimal(p * 100).underlying
      .stripTrailingZeros.toPlainString.replace(".", "_")
    val names = probs.map(pname)
    require(names.distinct.size == names.size, s"colliding percentile names $names")
    df.groupBy(group.as("grp"))
      .agg(percentile_approx(value, array(probs.map(lit): _*), lit(accuracy))
        .as("pcts"))
      .select(col("grp") +: probs.indices.map(i =>
        col("pcts")(i).as(names(i))): _*)
  }

  /** Time intelligence over a (date, amount) feed, at month grain:
    * MTD (month total), QTD/YTD running totals, same-period-last-year,
    * YoY delta/%, and the rolling 12-month total. Mirrors TOTALYTD/
    * TOTALQTD/TOTALMTD/SAMEPERIODLASTYEAR/DIVIDE and the
    * DATESINPERIOD(-12, MONTH) measure in Claims.tmdl.
    *
    * Scale: aggregates to month grain FIRST (one keyed shuffle), then
    * windows partition by year — ≤12 rows per partition — and the LY
    * lookup is a self-join on a tiny frame. The rolling-12M window is
    * unpartitioned but runs on the month-grain frame (≤ #months rows
    * total, regardless of input size). No global sort of input data.
    */
  def timeIntelligence(df: DataFrame, dateCol: Column, amount: Column): DataFrame =
    timeIntelligenceFor(df, dateCol,
      sum(amount.cast(DecimalType(18, 4))), "amount")

  /** Calculation-group form of [[timeIntelligence]]: applies the
    * YTD/QTD/MTD/LY/YoY/rolling-12M calculation family to ANY additive
    * aggregate — the analog of the reference's Time Calculation table
    * (Time Calculation.tmdl:4-24), whose items transform
    * SELECTEDMEASURE. `measureAgg` is the month-grain aggregate (e.g.
    * `sum(amount.cast(DecimalType(18,4)))` or `count(lit(1))`); it must
    * be additive across months for the running/rolling totals to equal
    * a recompute over the longer period (sums and counts are; distinct
    * counts are not). Output columns are `<name>_mtd/_qtd/_ytd/_r12m/
    * _ly/_yoy_delta/_yoy_pct`, all DOUBLE. Plan shape is unchanged from
    * the single-measure form: one keyed shuffle to month grain, then
    * windows over the tiny month frame. */
  def timeIntelligenceFor(df: DataFrame, dateCol: Column,
                          measureAgg: Column, name: String): DataFrame = {
    val monthly = df
      .groupBy(year(dateCol).as("yr"), quarter(dateCol).as("qtr"),
        month(dateCol).as("mo"))
      .agg(measureAgg.as(s"${name}_mtd"))
    timeCalcOverMonthly(monthly, name)
  }

  /** The window stage of [[timeIntelligenceFor]], over an
    * already-month-grain frame with columns `(keys…, yr, qtr, mo,
    * <name>_mtd)` — exposed so a caller that reaches month grain some
    * other way (e.g. [[SemanticModel.evaluateTime]] grouping through a
    * Dates dimension) shares the exact calculation-family arithmetic.
    * `keys` are extra slicer columns each calculation is computed
    * WITHIN (the matrix-visual shape: YTD by month by segment) — every
    * window partitions by them and the LY lookup matches on them, so
    * each key cell gets its own independent time series. All windows
    * run on the tiny month frame (≤ #months × #cells rows total,
    * regardless of the input size that produced it). */
  def timeCalcOverMonthly(monthly: DataFrame, name: String,
                          keys: Seq[String] = Nil): DataFrame = {
    val mtd = s"${name}_mtd"
    val ks = keys.map(col)
    val wYtd = Window.partitionBy(ks :+ col("yr"): _*).orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wQtd = Window.partitionBy(ks ++ Seq(col("yr"), col("qtr")): _*)
      .orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // calendar-aware month index so RANGE covers true last-12-months
    // even when some months are absent from the data
    val wR12 = Window.partitionBy(ks: _*)
      .orderBy(col("yr") * 12 + col("mo")).rangeBetween(-11, 0)
    // SAMEPERIODLASTYEAR as a lag over the month frame rather than a
    // monthly-self-join: a self-join re-executes BOTH branches of the
    // un-materialized month-grain aggregate — i.e. a second full
    // corpus pass — while lag(1) over (cell, mo) ordered by yr reads
    // the frame once; the prior row is LY exactly when its year is
    // contiguous (guarded — a gap year yields null, the join's
    // no-match semantics)
    val wLy = Window.partitionBy(ks :+ col("mo"): _*).orderBy(col("yr"))
    val cur = monthly
      .withColumn(s"${name}_ytd", sum(col(mtd)).over(wYtd))
      .withColumn(s"${name}_qtd", sum(col(mtd)).over(wQtd))
      .withColumn(s"${name}_r12m", sum(col(mtd)).over(wR12))
      .withColumn(s"${name}_ly",
        when(lag(col("yr"), 1).over(wLy) === col("yr") - 1,
          lag(col(mtd), 1).over(wLy)))
    cur
      .select(
        ks ++ Seq(col("yr"), col("mo"),
        col(mtd).cast(DoubleType).as(mtd),
        col(s"${name}_qtd").cast(DoubleType).as(s"${name}_qtd"),
        col(s"${name}_ytd").cast(DoubleType).as(s"${name}_ytd"),
        col(s"${name}_r12m").cast(DoubleType).as(s"${name}_r12m"),
        col(s"${name}_ly").cast(DoubleType).as(s"${name}_ly"),
        (col(mtd) - col(s"${name}_ly")).cast(DoubleType).as(s"${name}_yoy_delta"),
        ((col(mtd) - col(s"${name}_ly")).cast(DoubleType) /
          col(s"${name}_ly").cast(DoubleType)).as(s"${name}_yoy_pct")): _*)
  }

  /** The YEAR-level rows of the calculation family — what a matrix
    * visual shows on a collapsed Year row while the drill hierarchy
    * sits above Month (DAX semantics over a year filter context):
    * `mtd`/`qtd`/`ytd`/`r12m` evaluate AT THE YEAR'S LAST OBSERVED
    * MONTH (`DATESMTD/QTD/YTD(LASTDATE(...))` — so ytd on the year
    * row IS the year-so-far total), while `ly` is the measure over
    * the FULL previous year (`SAMEPERIODLASTYEAR` of a whole year)
    * and yoy compares full-year totals — guarded on year contiguity
    * like the month family's lag. Same input contract as
    * [[timeCalcOverMonthly]]; all windows run on the month frame and
    * the year fold is a bounded rn=1 cut per (keys…, yr). */
  def timeCalcYearly(monthly: DataFrame, name: String,
                     keys: Seq[String] = Nil): DataFrame = {
    val mtd = s"${name}_mtd"
    val ks = keys.map(col)
    val wYtd = Window.partitionBy(ks :+ col("yr"): _*).orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wQtd = Window.partitionBy(ks ++ Seq(col("yr"), col("qtr")): _*)
      .orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wR12 = Window.partitionBy(ks: _*)
      .orderBy(col("yr") * 12 + col("mo")).rangeBetween(-11, 0)
    // the year total attaches as a window sum over the month frame —
    // never a second branch over the un-materialized month aggregate
    // (the r11 single-pass-audit class)
    val wYrTot = Window.partitionBy(ks :+ col("yr"): _*)
    val wLastM = Window.partitionBy(ks :+ col("yr"): _*)
      .orderBy(col("mo").desc)
    val perYear = monthly
      .withColumn(s"${name}_ytd", sum(col(mtd)).over(wYtd))
      .withColumn(s"${name}_qtd", sum(col(mtd)).over(wQtd))
      .withColumn(s"${name}_r12m", sum(col(mtd)).over(wR12))
      .withColumn("_yr_total", sum(col(mtd)).over(wYrTot))
      .withColumn("_rn", row_number().over(wLastM))
      .filter(col("_rn") === 1)
    val wLy = Window.partitionBy(ks: _*).orderBy(col("yr"))
    perYear
      .withColumn(s"${name}_ly",
        when(lag(col("yr"), 1).over(wLy) === col("yr") - 1,
          lag(col("_yr_total"), 1).over(wLy)))
      .select(
        ks ++ Seq(col("yr"),
        col(mtd).cast(DoubleType).as(mtd),
        col(s"${name}_qtd").cast(DoubleType).as(s"${name}_qtd"),
        col(s"${name}_ytd").cast(DoubleType).as(s"${name}_ytd"),
        col(s"${name}_r12m").cast(DoubleType).as(s"${name}_r12m"),
        col(s"${name}_ly").cast(DoubleType).as(s"${name}_ly"),
        (col("_yr_total") - col(s"${name}_ly")).cast(DoubleType)
          .as(s"${name}_yoy_delta"),
        ((col("_yr_total") - col(s"${name}_ly")).cast(DoubleType) /
          col(s"${name}_ly").cast(DoubleType)).as(s"${name}_yoy_pct")): _*)
  }

  /** Year-over-year contribution decomposition — the waterfall report
    * behind "which cells DROVE the change": per cell, the latest data
    * year's total vs the previous year's, the delta, and the cell's
    * share of the TOTAL delta (Σ contrib_frac = 1 whenever the total
    * moved). Missing years read as 0 (the DAX blank-coalesce), so a
    * cell present in only one of the two years still contributes its
    * whole swing; cells last active BEFORE the compared pair don't
    * appear (they contribute 0 by definition). contrib_frac is null
    * when the total delta is exactly 0.
    *
    * Scale shape: ONE (cell, year) aggregation over the input; the
    * latest year and the total delta attach as unpartitioned window
    * aggregates over the cells-sized frame (never a second branch
    * over the un-materialized aggregate — the r11 single-pass
    * discipline). Totals and deltas are exact DECIMAL; each output
    * leaves decimal space through one cast, contrib_frac through one
    * IEEE division + 6-dp round. */
  def yoyContribution(df: DataFrame, cell: Column, dateCol: Column,
                      amount: Column): DataFrame = {
    val yearly = df.select(cell.as("cell"), year(dateCol).as("ry"),
        amount.as("v"))
      .groupBy("cell", "ry")
      .agg(sum(col("v").cast(DecimalType(18, 4))).as("t"))
    val wAll = Window.partitionBy()
    val zero = lit(BigDecimal(0)).cast(DecimalType(28, 4))
    val two = yearly.withColumn("max_yr", max(col("ry")).over(wAll))
      .filter(col("ry") >= col("max_yr") - 1)
      .groupBy("cell")
      .agg(max(col("max_yr")).as("yr"),
        coalesce(sum(when(col("ry") === col("max_yr"), col("t"))), zero)
          .as("cur_dec"),
        coalesce(sum(when(col("ry") === col("max_yr") - 1, col("t"))), zero)
          .as("prev_dec"))
    two
      .withColumn("delta_dec", col("cur_dec") - col("prev_dec"))
      .withColumn("total_dec", sum(col("delta_dec")).over(wAll))
      .select(col("cell"), col("yr"),
        col("cur_dec").cast(DoubleType).as("amount_cur"),
        col("prev_dec").cast(DoubleType).as("amount_prev"),
        col("delta_dec").cast(DoubleType).as("delta"),
        when(col("total_dec") === 0, lit(null)).otherwise(
          // §6 quantizer, not round(double, n): the quotient's final
          // presentation round must be engine-identical at the boundary
          qdp(col("delta_dec").cast(DoubleType) /
            col("total_dec").cast(DoubleType), 6)).as("contrib_frac"))
  }

  /** Top-N entities by exact amount, deterministic tiebreak on the key. */
  def topN(df: DataFrame, key: Column, amount: Column, n: Int): DataFrame =
    df.groupBy(key.as("key")).agg(decSum(amount).as("total"))
      .orderBy(col("total").desc, col("key").asc)
      .limit(n)

  /** Robust per-group outlier screen — the claims-anomaly shape
    * (flag amounts implausibly far from their status's typical value):
    * median + MAD instead of mean + stddev, so the screen itself isn't
    * dragged by the outliers it hunts (Hampel/Iglewicz–Hoaglin
    * |x − med| > z · 1.4826 · MAD, 1.4826 scaling MAD to σ under
    * normality). Exact interpolated medians (same definition as g9's
    * percentiles); deviations and the threshold round to 4 dp before
    * the comparison so engines agree at the boundary.
    *
    * Scale: three keyed aggregations and two joins, all on the
    * (low-cardinality) group key; the group medians frame is tiny and
    * broadcasts. No global sort. Output per group: n, med, mad,
    * n_outliers. */
  def robustOutliers(df: DataFrame, group: Column, value: Column,
                     z: Double = 3.0): DataFrame = {
    val base = df.select(group.as("grp"), value.as("v"))
    val med = base.groupBy("grp").agg(expr("percentile(v, 0.5)").as("med"))
    // §6 quantizer, not round(double, n): these 4-dp values feed the
    // adev > thr verdict, so both engines must quantize identically
    // at the half boundary (Quantize scaladoc)
    val dev = base.join(broadcast(med), "grp")
      .withColumn("adev", qdp(abs(col("v") - col("med")), 4))
    val mad = dev.groupBy("grp")
      .agg(min(col("med")).as("med"), expr("percentile(adev, 0.5)").as("mad"))
      .withColumn("thr", qdp(lit(z) * lit(1.4826) * col("mad"), 4))
    dev.select("grp", "adev").join(broadcast(mad), "grp")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        qdp(min(col("med")), 4).as("med"),
        qdp(min(col("mad")), 4).as("mad"),
        sum(when(col("adev") > col("thr"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Dense month grid: one row for EVERY (group, year, month) cell
    * between the data's first and last month, zero-filled where no
    * facts landed — the scaffold a time-series visual or
    * [[timeIntelligence]] consumer needs so a silent month reads as 0,
    * not as a missing row (the reference gets this from its dedicated
    * date dimension; this derives the same grid from the fact's own
    * bounds).
    *
    * Scale: ONE corpus-sized keyed aggregation — a single physical
    * pass; the grid (|groups| × months) then explodes out of the
    * aggregated cells themselves (per-group month maps of ≤ #months
    * entries, global bounds via an unpartitioned window over the
    * cells frame). No join back, no cross product, no second read of
    * the fact table. */
  def denseMonthly(df: DataFrame, group: Column, dateCol: Column,
                   amount: Column): DataFrame = {
    // one tree, one corpus pass: the branch form (bounds agg + distinct
    // groups + monthly cells, stitched with joins) re-executed the
    // corpus scan per branch (pruning defeats exchange reuse — this op
    // planned THREE scans). Instead: month-grain cells, global month
    // bounds attached by an unpartitioned window over the cells, then
    // per group the present months pack into a map (≤ #months entries)
    // and the dense grid explodes out of sequence(lo, hi) with map
    // lookups — zero-filling without ever re-reading the fact table.
    val monthly = df.groupBy(group.as("grp"),
        year(dateCol).as("yr"), month(dateCol).as("mo"))
      .agg(count(lit(1)).as("n"), decSum(amount).as("total"))
    val mIdx = col("yr") * 12 + (col("mo") - 1)
    val wAll = Window.partitionBy()
    monthly
      .withColumn("lo", min(mIdx).over(wAll))
      .withColumn("hi", max(mIdx).over(wAll))
      .groupBy(col("grp"), col("lo"), col("hi"))
      .agg(map_from_entries(collect_list(struct(mIdx.as("k"),
        struct(col("n"), col("total")).as("v")))).as("pm"))
      .select(col("grp"), explode(sequence(col("lo"), col("hi"))).as("k"),
        col("pm"))
      .select(col("grp"),
        (col("k") / 12).cast("int").as("yr"),
        (pmod(col("k"), lit(12)) + 1).cast("int").as("mo"),
        coalesce(col("pm")(col("k")).getField("n"), lit(0L)).as("n"),
        coalesce(col("pm")(col("k")).getField("total"), lit(0.0)).as("total"))
  }

  /** New-vs-returning cohort split at month grain — the acquisition
    * dashboard staple next to g18's retention triangle (retention asks
    * "of January's cohort, who came back"; this asks "of this month's
    * actives, who is brand new"): per month, distinct active entities,
    * entities whose FIRST-ever month this is (`n_new`), the returning
    * remainder, and the running cumulative distinct-entity count
    * (= Σ n_new — each entity is new exactly once, so the cumulative
    * needs no second distinct pass).
    *
    * Scale shape: one distinct on (entity, month) — the only
    * corpus-sized shuffle — then a per-entity window flags first
    * months in the same tree and one month-grain aggregation reduces
    * it; everything after is months-sized, including the cumulative
    * window (partitioned by nothing but over ~tens of rows, the
    * g6/g26 posture). */
  def newVsReturning(df: DataFrame, entity: Column, dateCol: Column): DataFrame = {
    val em = df.select(entity.as("ent"),
      year(dateCol).as("yr"), month(dateCol).as("mo")).distinct()
    // one tree: flag each (entity, month) row as the entity's first
    // month via a per-entity window, then a single month-grain agg —
    // the branch form (active ⋈ news, both off `em`) re-executed the
    // corpus distinct per branch (the pruning-defeats-reuse class)
    val wEnt = Window.partitionBy(col("ent"))
    val w = Window.orderBy("yr", "mo")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    em.withColumn("is_first",
        when(struct(col("yr"), col("mo")) ===
          min(struct(col("yr"), col("mo"))).over(wEnt), 1L).otherwise(0L))
      .groupBy("yr", "mo")
      .agg(count(lit(1)).as("n_active"), sum(col("is_first")).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .withColumn("cum_entities", sum(col("n_new")).over(w))
  }

  /** Share-of-parent / share-of-total — the "% of total" measure family
    * every semantic model ships (DAX `DIVIDE([x], CALCULATE([x],
    * ALL(...)))`, the reference's DIVIDE-rate idiom at Claims.tmdl
    * scaled from the one-row pack to a hierarchy): each (group, sub)
    * cell's amount as a fraction of its group's total and of the grand
    * total. Fractions are single IEEE divisions of decimal-exact sums,
    * rounded 6 dp so engines agree.
    *
    * Scale: ONE corpus-sized keyed aggregation — a single physical
    * pass; both denominators are window sums over the |cells| frame
    * (group-partitioned + one unpartitioned window over aggregated
    * rows, never over the fact table). */
  def shareOfTotal(df: DataFrame, group: Column, sub: Column,
                   amount: Column): DataFrame = {
    val cells = df.groupBy(group.as("grp"), sub.as("sub"))
      .agg(count(lit(1)).as("n"),
        sum(amount.cast(DecimalType(18, 4))).as("dec_total"))
    // denominators as window sums over the CELLS frame, not branch
    // re-aggregations: re-aggregating an un-materialized `cells`
    // re-executes the corpus aggregation per branch (column pruning
    // makes the branches differ, defeating exchange reuse — this op
    // planned THREE corpus scans in that form); the windows keep one
    // tree, one pass, and run over |cells| aggregated rows (the
    // unpartitioned one included — tiny by construction)
    val wGrp = Window.partitionBy(col("grp"))
    val wAll = Window.partitionBy()
    cells.select(col("grp"), col("sub"), col("n"),
      col("dec_total").cast(DoubleType).as("total"),
      // §6 quantizer on the share quotients (engine-identical at the
      // half boundary, unlike round(double, n))
      qdp(col("dec_total").cast(DoubleType) /
        sum(col("dec_total")).over(wGrp).cast(DoubleType), 6)
        .as("share_of_group"),
      qdp(col("dec_total").cast(DoubleType) /
        sum(col("dec_total")).over(wAll).cast(DoubleType), 6)
        .as("share_of_grand"))
  }

  /** Trailing moving average + running cumulative total per group at
    * month grain — the smoothing/running-total pair a time-series
    * visual layers over [[denseMonthly]]'s grid (DAX
    * AVERAGEX(DATESINPERIOD(...)) / TOTALYTD without the year reset).
    * `window` = trailing month count for the average (current month
    * inclusive; early months average over what exists, the DAX
    * convention). Money stays DECIMAL through the running sums; the
    * divide/round happen once at the end.
    *
    * Scale: the fact table is reduced to month grain by ONE keyed
    * aggregation; the windows then run partitioned by group over
    * months-sized frames (a few hundred rows per group regardless of
    * input size) with a total order (yr, mo unique within group) — the
    * same post-aggregation window posture as [[timeIntelligence]]. */
  def movingAverage(df: DataFrame, group: Column, dateCol: Column,
                    amount: Column, window: Int = 3): DataFrame = {
    val monthly = df.groupBy(group.as("grp"),
        year(dateCol).as("yr"), month(dateCol).as("mo"))
      .agg(count(lit(1)).as("n"),
        sum(amount.cast(DecimalType(18, 4))).as("dec_total"))
    val ord = Window.partitionBy(col("grp"))
      .orderBy(col("yr"), col("mo"))
    val trail = ord.rowsBetween(-(window - 1), Window.currentRow)
    monthly.select(col("grp"), col("yr"), col("mo"), col("n"),
      col("dec_total").cast(DoubleType).as("total"),
      // §6 quantizer on the mean quotient (see contrib_frac's note)
      qdp(sum(col("dec_total")).over(trail).cast(DoubleType) /
        count(lit(1)).over(trail), 6).as(s"ma$window"),
      sum(col("dec_total")).over(ord.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast(DoubleType).as("cum_total"))
  }

  /** Trailing-baseline anomaly detection — the daily-ops alerting
    * query next to [[movingAverage]]'s smoothing (the moving average
    * says the trend; this says WHICH days broke it): per (group, day),
    * total vs the mean/std of the preceding `lookback` OBSERVED days
    * (current day EXCLUDED — today must not launder its own spike into
    * the baseline), z-score flagged above `zThreshold`. "Preceding
    * days" is a ROWS frame over the group's observed daily series, not
    * a calendar RANGE: with gaps (days with zero events produce no
    * row) the baseline reaches back past the gap to the previous
    * `lookback` rows — the right contract for always-on series, and
    * for sparse ones it grades against typical ACTIVE days rather
    * than zero-filling the quiet ones into the mean (zero-fill would
    * flag every active day after a quiet week; densify the series
    * first, [[denseMonthly]]-style, if calendar semantics are wanted).
    * Days without a full baseline window are dropped (a 3-day-old
    * series has no honest z). Determinism: the window carries EXACT decimal Σx and
    * Σx² (products widened to DECIMAL(38,8)); mean/variance/z are
    * IEEE doubles derived from those exact sums in written order, z
    * rounded 6 dp BEFORE the threshold compare, constant-baseline
    * variance (≤ 0 after the subtraction) yields NULL z / false flag.
    *
    * Scale: one corpus-sized partial-aggregated daily rollup, then
    * all windows run over the DAYS-sized frame (groups × days rows) —
    * [[timeIntelligence]]'s post-aggregation window posture. */
  def anomalousDays(df: DataFrame, group: Column, dateCol: Column,
                    amount: Column, lookback: Int = 7,
                    zThreshold: Double = 3.0): DataFrame = {
    require(lookback >= 2, "need at least 2 baseline days for a std")
    val daily = df.groupBy(group.as("grp"), dateCol.as("day"))
      .agg(sum(amount.cast(DecimalType(18, 4))).as("dt"))
    val w = Window.partitionBy(col("grp")).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    val n = lit(lookback)
    daily.select(col("grp"), col("day"),
        col("dt").cast(DoubleType).as("total"),
        count(col("dt")).over(w).as("n_base"),
        sum(col("dt")).over(w).as("s1"),
        sum((col("dt") * col("dt")).cast(DecimalType(38, 8))).over(w).as("s2"))
      .filter(col("n_base") === lookback)
      .withColumn("mean", col("s1").cast(DoubleType) / n)
      .withColumn("vr",
        (col("s2").cast(DoubleType) -
          col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / n) /
          lit(lookback - 1))
      // §6 quantizer on the z quotient and the mean (both rounded
      // BEFORE the threshold compare, engine-identically)
      .withColumn("z", when(col("vr") > 0,
        qdp((col("total") - col("mean")) / sqrt(col("vr")), 6)))
      .select(col("grp"), col("day"), col("total"),
        qdp(col("mean"), 6).as("baseline_mean"), col("z"),
        coalesce(col("z") > zThreshold, lit(false)).as("is_anomaly"))
  }

  /** ABC / Pareto classification — the 80/15/5 contribution tiers every
    * spend-analysis report ships (which members carry the group): per
    * group, members rank by exact decimal total (desc, id tiebreak),
    * the running share of the group total cuts classes at `cutA`/`cutB`
    * (a member is 'A' while the cumulative share, itself included,
    * is <= cutA, …), then one rollup row per (group, class).
    *
    * Scale: one corpus-sized keyed aggregation to (group, member)
    * grain; the ranking windows run partitioned by group over the
    * AGGREGATED frame (members-sized, not fact-sized) — the same
    * post-aggregation window posture as [[timeIntelligence]]. Shares
    * are single IEEE divisions of exact decimal sums, rounded 6 dp
    * before the class cut so engines agree. */
  def abcClassification(df: DataFrame, group: Column, member: Column,
                        amount: Column, cutA: Double = 0.8,
                        cutB: Double = 0.95): DataFrame = {
    val m = df.groupBy(group.as("grp"), member.as("mem"))
      .agg(sum(amount.cast(DecimalType(18, 4))).as("dt"))
    val ord = Window.partitionBy(col("grp"))
      .orderBy(col("dt").desc, col("mem"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("grp"))
    m.withColumn("share",
        // §6 quantizer: rounded engine-identically BEFORE the class cut
        qdp(sum(col("dt")).over(ord).cast(DoubleType) /
          sum(col("dt")).over(all).cast(DoubleType), 6))
      .withColumn("abc_class",
        when(col("share") <= cutA, "A")
          .when(col("share") <= cutB, "B").otherwise(lit("C")))
      .groupBy("grp", "abc_class")
      .agg(count(lit(1)).as("n_members"),
        sum(col("dt")).cast(DoubleType).as("total"))
  }

  /** Gini concentration coefficient per group — the single-number
    * complement of [[abcClassification]]'s Pareto tiers (ABC answers
    * "which members carry the value", Gini answers "HOW concentrated
    * is it", 0 = perfectly even, →1 = one member carries everything):
    * per-member exact decimal totals, ranked ascending, then the
    * classic rank formula G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)
    * (i = ascending 1-based rank). Numerator and denominator are both
    * EXACT decimal sums — the one double op per group is the final
    * division (IEEE, engine-identical), so ties and summation order
    * can't wobble the 6-dp output.
    *
    * Scale: one partial-aggregated member-totals shuffle + one
    * per-group ranking sort over the MEMBER-sized frame (the same cost
    * class as any exact rank measure — at extreme member counts swap
    * the rank for a quantile-binned Lorenz approximation); ties rank
    * deterministically by member id. */
  def giniConcentration(df: DataFrame, group: Column, member: Column,
                        amount: Column): DataFrame = {
    val m = df.groupBy(group.as("grp"), member.as("mem"))
      .agg(sum(amount.cast(DecimalType(18, 4))).as("v"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("mem"))
    m.withColumn("i", row_number().over(w).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_members"),
        sum(col("v")).as("s0"),
        sum(col("i") * col("v")).as("s1"))
      .select(col("grp"), col("n_members"),
        col("s0").cast(DoubleType).as("total"),
        // zero-total groups have no defined concentration: null, not
        // the NaN the raw division would produce
        when(col("s0") === 0, lit(null).cast(DoubleType)).otherwise(
          // §6 quantizer on the final quotient (contrib_frac's note)
          qdp((lit(2) * col("s1") - (col("n_members") + 1) * col("s0"))
              .cast(DoubleType) /
            (col("n_members") * col("s0")).cast(DoubleType), 6)).as("gini"))
  }

  /** Winsorized aggregate pack — [[robustOutliers]] detects anomalies,
    * this CAPS them: per-group [pLo, pHi] bounds (exact R-7
    * percentiles like g9, rounded 4 dp so engines agree at the
    * boundary), every value clamped into the bounds before summing.
    * The robust-total variant a claims report quotes when one fat-
    * fingered amount would otherwise swamp a month.
    *
    * Scale: one bounds aggregation + one broadcast join of the
    * groups-sized bounds frame + one final aggregation — the exact
    * per-group percentile is the only history-sized cost (swap in
    * `approx_percentile`, the g14b posture, at 100 TB). Output per
    * group: n, n_low/n_high capped counts, exact decimal winsorized
    * total, the bounds. */
  def winsorizedStats(df: DataFrame, group: Column, value: Column,
                      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1")
    // NULL amounts are excluded up front: percentile already ignores
    // them, and greatest/least SKIP nulls — an unfiltered null row
    // would silently clamp to `lo` and fabricate that amount into the
    // robust total
    val base = df.select(group.as("grp"), value.as("v"))
      .filter(value.isNotNull)
    // §6 quantizer: the bounds feed the clamp verdicts (v < lo,
    // v > hi), so the 4-dp cut must be engine-identical (see
    // robustOutliers' note)
    val bounds = base.groupBy("grp").agg(
      qdp(expr(s"percentile(v, $pLo)"), 4).as("lo"),
      qdp(expr(s"percentile(v, $pHi)"), 4).as("hi"))
    base.join(broadcast(bounds), "grp")
      .withColumn("w", least(greatest(col("v"), col("lo")), col("hi")))
      .groupBy("grp").agg(
        count(lit(1)).as("n"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_high"),
        decSum(col("w")).as("wtotal"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"))
  }
}
