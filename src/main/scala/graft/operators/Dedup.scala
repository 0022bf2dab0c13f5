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

  /** Latest record per key via max_by aggregation — equivalent to
    * [[latestByKey]] when the ordering is "maximize `ord`" (a struct
    * of the ordering columns, compared lexicographically; must be a
    * total order per key or the winner is nondeterministic).
    *
    * Preferred at scale: unlike the window form — which shuffles every
    * row and sorts within each key — this partial-aggregates, so the
    * map side combines down to one candidate row per key per input
    * partition before the shuffle. The window form remains for mixed
    * asc/desc orderings and for extracting the duplicates themselves. */
  def latestByKeyAgg(df: DataFrame, keys: Seq[String], ord: Column): DataFrame = {
    val others = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), ord).as(RN))
      .select(keys.map(col) ++ others.map(c => col(s"$RN.$c")): _*)
  }

  /** The quarantined duplicates (row_number > 1), tagged with a
    * retention horizon like the reference's dupe_claims table. */
  def duplicatesByKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                      retentionDays: Int = 180): DataFrame =
    ranked(df, keys, order).filter(col(RN) > 1).drop(RN)
      .withColumn("RetentionDate", date_add(current_date(), retentionDays))
}
