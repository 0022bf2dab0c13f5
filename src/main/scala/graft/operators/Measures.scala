package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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
    * statuses = (approved, denied, pending) analog values. */
  def measurePack(df: DataFrame, amount: Column, status: Column, typ: Column,
                  entityA: Column, entityB: Column,
                  statuses: (String, String, String),
                  types: (String, String)): DataFrame = {
    val (app, den, pen) = statuses
    val (tyA, tyB) = types
    df.agg(
      count(lit(1)).as("total_claims"),
      decSum(amount).as("total_amount"),
      decAvg(amount).as("average_amount"),
      countDistinct(entityA).as("unique_patients"),
      countDistinct(entityB).as("unique_providers"),
      countWhere(status === app).as("approved_claims"),
      countWhere(status === den).as("denied_claims"),
      countWhere(status === pen).as("pending_claims"),
      sumWhere(amount, status === app).as("approved_amount"),
      sumWhere(amount, status === den).as("denied_amount"),
      sumWhere(amount, status === pen).as("pending_amount"),
      countWhere(typ === tyA).as("type_a_claims"),
      countWhere(typ === tyB).as("type_b_claims"),
      (countWhere(status === app).cast(DoubleType) / count(lit(1))).as("approval_rate"),
      (countWhere(status === den).cast(DoubleType) / count(lit(1))).as("denied_rate"),
      (countWhere(status === pen).cast(DoubleType) / count(lit(1))).as("pending_rate"))
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
  def timeIntelligence(df: DataFrame, dateCol: Column, amount: Column): DataFrame = {
    val monthly = df.select(
        year(dateCol).as("yr"), quarter(dateCol).as("qtr"), month(dateCol).as("mo"),
        amount.cast(DecimalType(18, 4)).as("amt"))
      .groupBy("yr", "qtr", "mo").agg(sum(col("amt")).as("amount_mtd"))
    val wYtd = Window.partitionBy(col("yr")).orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wQtd = Window.partitionBy(col("yr"), col("qtr")).orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // calendar-aware month index so RANGE covers true last-12-months
    // even when some months are absent from the data
    val wR12 = Window.orderBy(col("yr") * 12 + col("mo")).rangeBetween(-11, 0)
    val cur = monthly
      .withColumn("amount_ytd", sum(col("amount_mtd")).over(wYtd))
      .withColumn("amount_qtd", sum(col("amount_mtd")).over(wQtd))
      .withColumn("amount_r12m", sum(col("amount_mtd")).over(wR12))
    val ly = monthly.select((col("yr") + 1).as("yr"), col("mo"),
      col("amount_mtd").as("amount_ly"))
    cur.join(ly, Seq("yr", "mo"), "left")
      .select(
        col("yr"), col("mo"),
        col("amount_mtd").cast(DoubleType).as("amount_mtd"),
        col("amount_qtd").cast(DoubleType).as("amount_qtd"),
        col("amount_ytd").cast(DoubleType).as("amount_ytd"),
        col("amount_r12m").cast(DoubleType).as("amount_r12m"),
        col("amount_ly").cast(DoubleType).as("amount_ly"),
        (col("amount_mtd") - col("amount_ly")).cast(DoubleType).as("amount_yoy_delta"),
        ((col("amount_mtd") - col("amount_ly")).cast(DoubleType) /
          col("amount_ly").cast(DoubleType)).as("amount_yoy_pct"))
  }

  /** Top-N entities by exact amount, deterministic tiebreak on the key. */
  def topN(df: DataFrame, key: Column, amount: Column, n: Int): DataFrame =
    df.groupBy(key.as("key")).agg(decSum(amount).as("total"))
      .orderBy(col("total").desc, col("key").asc)
      .limit(n)
}
