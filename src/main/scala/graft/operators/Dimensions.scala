package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Conformed-dimension builders.
  *
  * Re-expresses the reference silver notebook
  * (fabric/claims/silver/NBclaims_silver.Notebook/notebook-content.py):
  *  - dimension extraction = distinct projection of descriptive
  *    attributes off the cleaned fact feed (py:96-110);
  *  - calendar dimension generated from a date range with
  *    sequence/explode, DateID, year/month/day and English month/day
  *    names (py:134-152).
  */
object Dimensions {

  /** Distinct projection — the reference's `df.select(attrs).distinct()`.
    * One shuffle; Catalyst prunes the scan to exactly `cols`. */
  def extract(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** Calendar dimension for [start, end], both inclusive.
    *
    * The reference computed DateID with row_number over a GLOBAL
    * window (single-partition sort — a scale hazard); for a contiguous
    * range `datediff(d, start) + 1` is identical and embarrassingly
    * parallel, so we use that. Names use Spark's en-US formatter
    * ("MMMM"/"EEEE" → January/Monday), matching the reference output.
    */
  def dateDimension(spark: SparkSession, start: LocalDate, end: LocalDate): DataFrame = {
    val s = lit(java.sql.Date.valueOf(start))
    val e = lit(java.sql.Date.valueOf(end))
    spark.range(1).select(explode(sequence(s, e, expr("interval 1 day"))).as("Date"))
      .select(
        (datediff(col("Date"), s) + 1).as("DateID"),
        col("Date"),
        year(col("Date")).as("Year"),
        month(col("Date")).as("Month"),
        dayofmonth(col("Date")).as("Day"),
        date_format(col("Date"), "MMMM").as("MonthName"),
        date_format(col("Date"), "EEEE").as("DayName"))
  }
}
