package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine.
  *
  * Re-expresses the reference's bronze DQ gate
  * (fabric/claims/bronze/NBclaims_bronze.Notebook/notebook-content.py:141-171):
  * an array of (condition, reason) pairs evaluated per row, surviving
  * reasons joined with ";" into a `DataQualityReason` column, bad rows
  * quarantined.
  *
  * Differences from the reference, for scale:
  *  - the reference split clean rows with a `left_anti` self-join on
  *    the key (an extra shuffle); here both splits are map-only filters
  *    on the same computed column — no shuffle at all.
  *  - rules are plain Catalyst `Column`s, so they stay inside
  *    whole-stage codegen and push into scans where possible.
  */
object QualityRules {
  final case class Rule(condition: Column, reason: String)

  val ReasonCol = "DataQualityReason"

  /** Append the ";"-joined reason string ("" = clean). concat_ws skips
    * nulls, mirroring the reference's array+exists+concat_ws dance in
    * one expression. */
  def withReasons(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn(ReasonCol, concat_ws(";",
      rules.map(r => when(r.condition, lit(r.reason))): _*))

  /** Rows failing at least one rule, with reasons and retention. */
  def quarantined(df: DataFrame, rules: Seq[Rule], retentionDays: Int = 365): DataFrame =
    withReasons(df, rules).filter(length(col(ReasonCol)) > 0)
      .withColumn("RetentionDate", date_add(current_date(), retentionDays))

  /** Rows passing every rule (reason string empty), reason col dropped. */
  def clean(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withReasons(df, rules).filter(length(col(ReasonCol)) === 0).drop(ReasonCol)
}
