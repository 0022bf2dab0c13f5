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
  *  - relationships are declared once ([[Dimension]]), and
  *  - `evaluate` joins ONLY the dimensions the request actually
  *    references — grouping, filtering, or measures — the join
  *    pruning a DAX engine performs, so a fact-only request never
  *    touches a dimension table.
  *
  * Scale: dimensions are broadcast by default (star dims are small by
  * design; set `broadcastable = false` for a dimension that isn't),
  * so an evaluation is map-side joins + ONE keyed shuffle for the
  * group-by with partial aggregation — request filters are applied
  * before aggregation and land in the scan via normal pushdown.
  */
final case class Dimension(table: DataFrame, factKey: String,
                           dimKey: String, broadcastable: Boolean = true)

/** @param fact       the fact table every measure aggregates over
  * @param dimensions name → dimension, joined on demand
  * @param measures   the ordered measure catalog: output name → agg
  *                   expression (names must be unique) */
final case class SemanticModel(fact: DataFrame,
                               dimensions: Map[String, Dimension],
                               measures: Seq[(String, Column)]) {
  require(measures.nonEmpty, "a semantic model needs at least one measure")
  require(measures.map(_._1).distinct.size == measures.size,
    s"duplicate measure names: ${measures.map(_._1)}")

  private val catalog = measures.toMap

  /** Column names each dimension contributes (minus its join key's
    * fact side — that lives on the fact). */
  private def dimColumns(d: Dimension): Set[String] =
    d.table.columns.toSet

  private def referencedNames(c: Column): Set[String] =
    ColumnBridge.catalystExpression(c).collect {
      case a: UnresolvedAttribute => a.nameParts.last
      case a: Attribute => a.name
    }.toSet

  /** Evaluate a request: group by `groupBy` (column names, fact or
    * dimension), compute `measureNames` from the catalog, after
    * applying `filters` (ANDed, pre-aggregation — a report's slicers).
    * Only dimensions referenced by the request are joined; unknown
    * measure or group-by names fail fast. With `groupBy` empty the
    * result is the one-row grand total (the card visual). */
  def evaluate(groupBy: Seq[String], measureNames: Seq[String],
               filters: Seq[Column] = Nil): DataFrame = {
    require(measureNames.nonEmpty, "a request needs at least one measure")
    val unknown = measureNames.filterNot(catalog.contains)
    require(unknown.isEmpty,
      s"unknown measures: ${unknown.mkString(", ")} " +
        s"(catalog: ${measures.map(_._1).mkString(", ")})")

    val wanted: Set[String] = groupBy.toSet ++
      filters.flatMap(referencedNames) ++
      measureNames.flatMap(n => referencedNames(catalog(n)))
    val factCols = fact.columns.toSet
    val neededDims = dimensions.filter { case (_, d) =>
      // a name that exists on the fact resolves there; only names the
      // fact can't supply pull their dimension in
      (dimColumns(d) -- factCols).intersect(wanted).nonEmpty
    }
    groupBy.foreach { g =>
      require(factCols.contains(g) ||
        neededDims.values.exists(d => dimColumns(d).contains(g)),
        s"group-by column '$g' is on neither the fact nor any dimension")
    }

    val joined = neededDims.values.foldLeft(fact) { (acc, d) =>
      val t = if (d.broadcastable) broadcast(d.table) else d.table
      acc.join(t, acc(d.factKey) === d.table(d.dimKey))
    }
    val filtered = filters.foldLeft(joined)(_ filter _)
    val aggs = measureNames.map(n => catalog(n).as(n))
    if (groupBy.isEmpty) filtered.agg(aggs.head, aggs.tail: _*)
    else filtered.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

object SemanticModel {

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
