package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.ColumnBridge

/** Semantic-model serving — the computable half of the reference's
  * semantic model (`Semantic and Reports/SM_Claims.SemanticModel`):
  * a measure CATALOG over a star schema, evaluated per request. The
  * reference declares measures in DAX (tables/Claims.tmdl:5-216 —
  * COUNTROWS / SUM / DISTINCTCOUNT / CALCULATE-filtered variants /
  * DIVIDE ratios) and relationships as fact→dimension joins
  * (definition/relationships.tmdl); a report visual then asks for
  * (group-by columns, measure names, slicer filters) and the engine
  * compiles the minimal join+aggregate. XMLA/DAX wire protocol and
  * visual rendering stay platform territory (SURVEY §2's declared
  * boundary); what IS library-shaped is exactly this compilation:
  *
  *  - measures are named aggregate [[Column]]s over the joined star
  *    (the Spark analog of a DAX measure definition — composable,
  *    reusable, defined once per model, e.g. through
  *    [[SemanticModel.calculateCount]] for the CALCULATE family and
  *    [[SemanticModel.divide]] for DAX DIVIDE's null-on-zero),
  *  - relationships are declared once ([[Dimension]]), with optional
  *    named drill [[Dimension.hierarchies]] (the reference's
  *    `Dates.tmdl:109-131` Year>Month>Day hierarchy),
  *  - `evaluate` joins ONLY the dimensions the request actually
  *    references — grouping, filtering, or measures — the join
  *    pruning a DAX engine performs, so a fact-only request never
  *    touches a dimension table,
  *  - `evaluateTime` applies the calculation-group items of the
  *    reference's Time Calculation table (`Time Calculation
  *    .tmdl:4-24`, SELECTEDMEASURE → YTD/QTD/MTD/SPLY/YoY) to ANY
  *    catalog measure through the declared [[DatesRole]], and
  *  - `evaluateDrill` / `evaluateRollup` serve hierarchy requests
  *    (drill to a level; subtotals across all levels).
  *
  * Name resolution: a column name that exists on the fact resolves
  * there — a dimension column of the same name is SHADOWED and never
  * joined in (dimension payload columns colliding with fact columns
  * are dropped at join time, so a request mixing fact and dimension
  * names is never ambiguous against the fact). A name supplied by TWO
  * joined dimensions, though, has no principled winner: that request
  * fails fast with the offending name and dimensions rather than
  * surfacing Spark's ambiguous-reference AnalysisException.
  *
  * Dimension joins are LEFT joins: a fact row with an unmatched (or
  * null) dimension key survives aggregation under a null dimension
  * member — the DAX engine's blank-member behavior — so a measure's
  * grand total is identical whether or not the request pulls a
  * dimension in. (An inner join would silently drop unmatched fact
  * rows and make totals depend on which columns a request mentions.)
  *
  * Scale: dimensions are broadcast by default (star dims are small by
  * design; set `broadcastable = false` for a dimension that isn't),
  * so an evaluation is map-side joins + ONE keyed shuffle for the
  * group-by with partial aggregation — request filters are applied
  * before aggregation and land in the scan via normal pushdown. Time
  * calculations add window passes only over the month-grain frame
  * (≤ #months rows, regardless of fact size — [[Measures
  * .timeCalcOverMonthly]]).
  */
final case class Dimension(table: DataFrame, factKey: String,
                           dimKey: String, broadcastable: Boolean = true,
                           hierarchies: Map[String, Seq[String]] = Map.empty) {
  hierarchies.foreach { case (name, levels) =>
    require(levels.nonEmpty, s"hierarchy '$name' has no levels")
    require(levels.distinct.size == levels.size,
      s"hierarchy '$name' repeats a level: $levels")
    val missing = levels.filterNot(table.columns.contains)
    require(missing.isEmpty,
      s"hierarchy '$name' levels not on the dimension: $missing")
  }
}

/** Marks one dimension as the model's Dates table (the reference's
  * `Dates.tmdl` related on the fact date key): `year`/`month` name the
  * dimension's calendar columns (quarter derives from month). Time
  * calculations group the fact THROUGH this dimension, the
  * SELECTEDMEASURE shape of the reference's Time Calculation group. */
final case class DatesRole(dimension: String, year: String, month: String)

/** @param fact       the fact table every measure aggregates over
  * @param dimensions name → dimension, joined on demand
  * @param measures   the ordered measure catalog: output name → agg
  *                   expression (names must be unique)
  * @param dates      optional Dates-table role enabling `evaluateTime` */
final case class SemanticModel(fact: DataFrame,
                               dimensions: Map[String, Dimension],
                               measures: Seq[(String, Column)],
                               dates: Option[DatesRole] = None) {
  require(measures.nonEmpty, "a semantic model needs at least one measure")
  require(measures.map(_._1).distinct.size == measures.size,
    s"duplicate measure names: ${measures.map(_._1)}")
  dates.foreach { r =>
    val d = dimensions.getOrElse(r.dimension, throw new IllegalArgumentException(
      s"dates role names unknown dimension '${r.dimension}'"))
    val missing = Seq(r.year, r.month).filterNot(d.table.columns.contains)
    require(missing.isEmpty,
      s"dates dimension '${r.dimension}' lacks calendar columns: $missing")
  }

  private val catalog = measures.toMap

  /** Every column name a dimension can serve a request (all of its
    * columns, including its own join key — requests may group by
    * either side of the relationship). Fact-side shadowing is applied
    * at resolution time, not here. */
  private def dimColumns(d: Dimension): Set[String] =
    d.table.columns.toSet

  private def referencedNames(c: Column): Set[String] =
    ColumnBridge.catalystExpression(c).collect {
      case a: UnresolvedAttribute => a.nameParts.last
      case a: Attribute => a.name
    }.toSet

  /** Join the fact to every dimension serving a name in `wanted` that
    * the fact can't supply, plus `forceDims` — left joins, shadowed
    * payload columns dropped, cross-dimension ambiguity fail-fast. */
  private def joinedFor(wanted: Set[String],
                        forceDims: Set[String] = Set.empty): DataFrame = {
    val factCols = fact.columns.toSet
    val neededDims = dimensions.filter { case (name, d) =>
      // a name that exists on the fact resolves there; only names the
      // fact can't supply pull their dimension in
      forceDims.contains(name) ||
        (dimColumns(d) -- factCols).intersect(wanted).nonEmpty
    }
    // two joined dimensions both serving a referenced name has no
    // principled winner — fail with the name, not an AnalysisException
    if (neededDims.size > 1) {
      val served = neededDims.toSeq.flatMap { case (name, d) =>
        (dimColumns(d) -- factCols).intersect(wanted).map(_ -> name) }
      val clashes = served.groupBy(_._1).filter(_._2.size > 1)
      require(clashes.isEmpty,
        clashes.map { case (c, ds) =>
          s"column '$c' is ambiguous across dimensions ${ds.map(_._2).sorted.mkString(", ")}"
        }.mkString("; "))
    }
    neededDims.values.foldLeft(fact) { (acc, d) =>
      // project away payload columns the fact shadows (keep the join
      // key); after the join the dim-side key survives ONLY when the
      // request references it and the fact can't supply the name —
      // requests may group/filter by either side of the relationship
      // (unmatched fact rows then land under the null blank member).
      // Otherwise it is dropped so the frame has exactly one column
      // per resolvable name.
      val keep = (dimColumns(d) -- factCols) + d.dimKey
      val proj = d.table.select(keep.toSeq.sorted.map(d.table(_)): _*)
      val t = if (d.broadcastable) broadcast(proj) else proj
      val joined = acc.join(t, acc(d.factKey) === proj(d.dimKey), "left")
      if (wanted.contains(d.dimKey) && !factCols.contains(d.dimKey)) joined
      else joined.drop(proj(d.dimKey))
    }
  }

  /** Evaluate a request: group by `groupBy` (column names, fact or
    * dimension), compute `measureNames` from the catalog, after
    * applying `filters` (ANDed, pre-aggregation — a report's slicers).
    * Only dimensions referenced by the request are joined; unknown
    * measure or group-by names fail fast. With `groupBy` empty the
    * result is the one-row grand total (the card visual). */
  def evaluate(groupBy: Seq[String], measureNames: Seq[String],
               filters: Seq[Column] = Nil): DataFrame = {
    requireMeasures(measureNames)
    val wanted: Set[String] = groupBy.toSet ++
      filters.flatMap(referencedNames) ++
      measureNames.flatMap(n => referencedNames(catalog(n)))
    val factCols = fact.columns.toSet
    groupBy.foreach { g =>
      require(factCols.contains(g) ||
        dimensions.values.exists(d => dimColumns(d).contains(g)),
        s"group-by column '$g' is on neither the fact nor any dimension")
    }
    val filtered = filters.foldLeft(joinedFor(wanted))(_ filter _)
    val aggs = measureNames.map(n => catalog(n).as(n))
    if (groupBy.isEmpty) filtered.agg(aggs.head, aggs.tail: _*)
    else filtered.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Time-calculation request — the reference's Time Calculation group
    * applied to catalog measure `measureName` over the declared
    * [[DatesRole]]: group the (filtered, dimension-joined) fact to
    * month grain through the Dates dimension, then compute the asked
    * `variants` (of [[SemanticModel.timeVariants]]: `mtd` current
    * month, `qtd`/`ytd` running totals, `r12m` rolling 12 months, `ly`
    * SAMEPERIODLASTYEAR, `yoy_delta`/`yoy_pct`). `groupBy` adds slicer
    * columns (fact or dimension — the matrix visual's rows): each cell
    * gets its own independent time series (windows partition by the
    * cell, the LY lookup matches within it; a null blank-member cell
    * has no LY match — null-strict join, same as the SQL replay).
    * Output is one row per (groupBy…, yr, mo) with a
    * `<measure>_<variant>` DOUBLE column per variant. The measure must
    * be additive across months for the running / rolling variants to
    * equal a recompute over the longer period (sums and counts are;
    * distinct counts are not — [[Measures.timeIntelligenceFor]]'s
    * contract).
    *
    * `drill` = (hierarchy, level) on the DATES dimension composes the
    * calc group with the drill hierarchy — the matrix visual showing
    * YTD/SPLY variants while expanded to a Dates level. The level
    * must be the role's year or month column: at the month level the
    * output is the standard month series under the hierarchy's level
    * names; at the YEAR level rows follow DAX's collapsed-year
    * semantics ([[Measures.timeCalcYearly]] — mtd/qtd/ytd/r12m at the
    * year's last observed month, ly/yoy against the full previous
    * year). Sub-month levels fail fast: the calculations are
    * month-grain. */
  def evaluateTime(measureName: String, variants: Seq[String],
                   groupBy: Seq[String] = Nil,
                   filters: Seq[Column] = Nil,
                   drill: Option[(String, String)] = None): DataFrame = {
    requireMeasures(Seq(measureName))
    require(variants.nonEmpty, "a time request needs at least one variant")
    val bad = variants.filterNot(SemanticModel.timeVariants.contains)
    require(bad.isEmpty, s"unknown time variants: ${bad.mkString(", ")} " +
      s"(supported: ${SemanticModel.timeVariants.mkString(", ")})")
    require(variants.distinct.size == variants.size,
      s"repeated time variants: $variants")
    val role = dates.getOrElse(throw new IllegalArgumentException(
      "evaluateTime needs a DatesRole declared on the model"))
    require(!groupBy.exists(Seq("yr", "qtr", "mo").contains),
      "yr/qtr/mo are the time axes evaluateTime itself produces")
    require(!groupBy.exists(Seq(role.year, role.month).contains),
      s"'${role.year}'/'${role.month}' are the Dates role's calendar " +
        "columns — evaluateTime derives its time axes from them (a " +
        "slicer copy would collide with the drill output's level names)")
    val factCols = fact.columns.toSet
    groupBy.foreach { g =>
      require(factCols.contains(g) ||
        dimensions.values.exists(d => dimColumns(d).contains(g)),
        s"group-by column '$g' is on neither the fact nor any dimension")
    }
    val wanted: Set[String] = groupBy.toSet ++
      filters.flatMap(referencedNames) ++
      referencedNames(catalog(measureName))
    val joined = joinedFor(wanted, forceDims = Set(role.dimension))
    val filtered = filters.foldLeft(joined)(_ filter _)
    val mo = col(role.month).cast("int")
    val monthly = filtered
      .groupBy(groupBy.map(col) ++ Seq(col(role.year).cast("int").as("yr"),
        (((mo - 1) / 3).cast("int") + 1).as("qtr"), mo.as("mo")): _*)
      .agg(catalog(measureName).as(s"${measureName}_mtd"))
    val vCols = variants.map(v => col(s"${measureName}_$v"))
    drill match {
      case None =>
        val full = Measures.timeCalcOverMonthly(monthly, measureName, groupBy)
        full.select(groupBy.map(col) ++ Seq(col("yr"), col("mo")) ++
          vCols: _*)
      case Some((hier, level)) =>
        val levels = hierarchyLevels(role.dimension, hier)
        require(levels.contains(level),
          s"unknown level '$level' in hierarchy '$hier' of " +
            s"'${role.dimension}' (levels: ${levels.mkString(" > ")})")
        if (level == role.month) {
          val full = Measures.timeCalcOverMonthly(monthly, measureName, groupBy)
          full.select(groupBy.map(col) ++
            Seq(col("yr").as(role.year), col("mo").as(role.month)) ++
            vCols: _*)
        } else if (level == role.year) {
          val full = Measures.timeCalcYearly(monthly, measureName, groupBy)
          full.select(groupBy.map(col) ++
            Seq(col("yr").as(role.year)) ++ vCols: _*)
        } else throw new IllegalArgumentException(
          s"time calculations are month-grain: drill level '$level' of " +
            s"hierarchy '$hier' is below '${role.month}' (or not a " +
            s"calendar grain) — drill to '${role.year}' or '${role.month}'")
    }
  }

  /** TOPN request — DAX `TOPN(n, SUMMARIZE(...), [measure])`, the
    * top-N visual through the model: evaluate the request, keep the
    * `n` best cells by the FIRST measure (descending, deterministic
    * tiebreak on the groupBy columns ascending — DAX's TOPN is
    * tie-inclusive and nondeterministic in size; a report wants a
    * stable cut). The cut is TakeOrderedAndProject over the
    * aggregated cells frame — each partition keeps n rows, never a
    * global sort; the corpus-sized work is [[evaluate]]'s single
    * grain aggregation. */
  def evaluateTopN(n: Int, groupBy: Seq[String], measureNames: Seq[String],
                   filters: Seq[Column] = Nil): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(groupBy.nonEmpty, "TOPN ranks cells — group by at least one column")
    evaluate(groupBy, measureNames, filters)
      .orderBy(col(measureNames.head).desc +: groupBy.map(col(_).asc): _*)
      .limit(n)
  }

  /** Drill-down request: group by hierarchy `hierarchy` of dimension
    * `dimName`, from its top level down TO `level` inclusive (the
    * path-prefix semantics of expanding a visual to a level), plus the
    * catalog measures. Unknown dimension / hierarchy / level names
    * fail fast. */
  def evaluateDrill(dimName: String, hierarchy: String, level: String,
                    measureNames: Seq[String],
                    filters: Seq[Column] = Nil): DataFrame = {
    val levels = hierarchyLevels(dimName, hierarchy)
    require(levels.contains(level),
      s"unknown level '$level' in hierarchy '$hierarchy' of '$dimName' " +
        s"(levels: ${levels.mkString(" > ")})")
    evaluate(levels.take(levels.indexOf(level) + 1), measureNames, filters)
  }

  /** Subtotal request: ROLLUP across ALL levels of the hierarchy —
    * every drill prefix plus the grand total in one pass, each row
    * tagged with `lvl` (the grouping-set bit vector, top level most
    * significant; 0 = leaf grain, all-bits = grand total) so subtotal
    * rows are distinguishable from genuinely-null level values. */
  def evaluateRollup(dimName: String, hierarchy: String,
                     measureNames: Seq[String],
                     filters: Seq[Column] = Nil): DataFrame = {
    requireMeasures(measureNames)
    val levels = hierarchyLevels(dimName, hierarchy)
    val wanted: Set[String] = levels.toSet ++
      filters.flatMap(referencedNames) ++
      measureNames.flatMap(n => referencedNames(catalog(n)))
    val filtered = filters.foldLeft(
      joinedFor(wanted, forceDims = Set(dimName)))(_ filter _)
    val aggs = grouping_id().cast("long").as("lvl") +:
      measureNames.map(n => catalog(n).as(n))
    filtered.rollup(levels.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def hierarchyLevels(dimName: String, hierarchy: String): Seq[String] = {
    val d = dimensions.getOrElse(dimName, throw new IllegalArgumentException(
      s"unknown dimension '$dimName' (have: ${dimensions.keys.toSeq.sorted.mkString(", ")})"))
    d.hierarchies.getOrElse(hierarchy, throw new IllegalArgumentException(
      s"unknown hierarchy '$hierarchy' on '$dimName' " +
        s"(have: ${d.hierarchies.keys.toSeq.sorted.mkString(", ")})"))
  }

  private def requireMeasures(measureNames: Seq[String]): Unit = {
    require(measureNames.nonEmpty, "a request needs at least one measure")
    val unknown = measureNames.filterNot(catalog.contains)
    require(unknown.isEmpty,
      s"unknown measures: ${unknown.mkString(", ")} " +
        s"(catalog: ${measures.map(_._1).mkString(", ")})")
  }
}

object SemanticModel {

  /** The calculation-group items `evaluateTime` serves, in the
    * reference's Time Calculation table order. */
  val timeVariants: Seq[String] =
    Seq("mtd", "qtd", "ytd", "r12m", "ly", "yoy_delta", "yoy_pct")

  /** DAX `CALCULATE([count measure], <cond>)`: rows matching `cond`. */
  def calculateCount(cond: Column): Column = count(when(cond, lit(1)))

  /** DAX `CALCULATE(SUM(x), <cond>)` with the catalog's exact-decimal
    * sum discipline (one IEEE cast at the end, like
    * [[Measures.decSum]]). */
  def calculateSum(value: Column, cond: Column): Column =
    sum(when(cond, value)
      .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
      .cast("double")

  /** DAX `DIVIDE(a, b)`: null on a zero/null denominator instead of
    * an error or infinity. */
  def divide(a: Column, b: Column): Column =
    when(b.isNull || b === 0, lit(null)).otherwise(a / b)
}
