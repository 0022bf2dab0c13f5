package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication: keep the "latest" record per business key,
  * quarantine the rest.
  *
  * Re-expresses the reference's bronze duplicate split
  * (fabric/claims/bronze/NBclaims_bronze.Notebook/notebook-content.py:123-131
  * — `row_number().over(Window.partitionBy("ClaimID").orderBy(desc))`)
  * generalized to any key/ordering.
  *
  * Scale: one hash shuffle on the key, no global sort; the per-key sort
  * is local to the window partition. Callers must pass a TOTAL ordering
  * (include a unique tiebreaker column) or the winner is
  * nondeterministic — the reference ordered only by ClaimDate, which is
  * not total; we require determinism for the oracle gate.
  */
object Dedup {
  private val RN = "__graft_rn"

  private def ranked(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    df.withColumn(RN, row_number().over(
      Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))

  /** Latest record per key (row_number == 1). */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    ranked(df, keys, order).filter(col(RN) === 1).drop(RN)

  /** The quarantined duplicates (row_number > 1), tagged with a
    * retention horizon like the reference's dupe_claims table. */
  def duplicatesByKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                      retentionDays: Int = 180): DataFrame =
    ranked(df, keys, order).filter(col(RN) > 1).drop(RN)
      .withColumn("RetentionDate", date_add(current_date(), retentionDays))
}
