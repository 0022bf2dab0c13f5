package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions so
  * graft can expose custom Catalyst expressions (e.g.
  * [[graft.functions.DotProduct]]) as regular `Column`s. Lives under
  * `org.apache.spark.sql` purely for access; contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The fully-converted Catalyst tree behind `c`. [[expression]]
    * returns a LAZY `ColumnNodeExpression` wrapper whose children are
    * not traversable before analysis; this converts eagerly — use it
    * when inspecting the tree (e.g. collecting referenced column
    * names), not when building plans. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** `Dataset.ofRows` for executing a hand-transformed logical plan
    * (used by specs to drive optimizer rules directly). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
