package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** MERGE (upsert) semantics over immutable snapshots.
  *
  * Re-expresses the reference's Delta MERGE
  * (fabric/claims/bronze/NBclaims_bronze.Notebook/notebook-content.py:215-227
  * and silver fact upsert: whenMatchedUpdateAll / whenNotMatchedInsertAll)
  * and the Gold warehouse's change-detection upsert
  * (fabric/claims/gold/WHclaims_gold.Warehouse/Health/StoredProcedures/
  * sp_upsert_claims.sql — UPDATE only when any column differs, INSERT
  * where NOT EXISTS).
  *
  * Without a transactional table format the merge is expressed as a
  * logical plan over the two snapshots: target-not-matched ∪ source.
  * Scale: both sides shuffle once on the key (the anti join and the
  * union are key-partitioned); at lake scale this is the same shuffle a
  * MERGE-on-read executes. Source must be unique per key (the reference
  * dedupes upstream; see [[Dedup]]).
  */
object Merge {

  /** whenMatchedUpdateAll + whenNotMatchedInsertAll: source wins on key
    * collision, unmatched target rows survive.
    *
    * `evolveSchema = true` gives Delta's auto-merge semantics
    * (`whenMatchedUpdateAll` under `schema.autoMerge`): columns present
    * on only one side survive with NULLs on the other — a curation
    * batch that gains a column no longer kills the MERGE loop, and old
    * snapshot rows read NULL for the new column. With identical
    * schemas the flag is a no-op, so callers that want strictness (a
    * schema typo should FAIL, not null-fill) keep the default. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
             evolveSchema: Boolean = false): DataFrame =
    target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(source, allowMissingColumns = evolveSchema)

  /** Change-detection upsert metrics, mirroring sp_upsert_claims's
    * @@ROWCOUNT outputs: rows updated (matched AND any compared column
    * differs, null-safe like the proc's ISNULL(a,'')<>ISNULL(b,'')),
    * rows inserted (key absent from target), and final row count.
    * Returns a 1-row DataFrame (rows_updated, rows_inserted, total_rows).
    */
  def conditionalUpsertMetrics(target: DataFrame, source: DataFrame,
                               keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val t = target.select((keys ++ compareCols).map(c => col(c).as("t_" + c)): _*)
    val s = source.select((keys ++ compareCols).map(c => col(c).as("s_" + c)): _*)
    val joinCond = keys.map(k => col("t_" + k) === col("s_" + k)).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")
    val differs = compareCols
      .map(c => !(col("t_" + c) <=> col("s_" + c)))
      .reduce(_ || _)
    val matched = keys.map(k => col("t_" + k).isNotNull && col("s_" + k).isNotNull).reduce(_ && _)
    val inserted = keys.map(k => col("t_" + k).isNull && col("s_" + k).isNotNull).reduce(_ && _)
    val kept = keys.map(k => col("t_" + k).isNotNull && col("s_" + k).isNull).reduce(_ && _)
    joined.agg(
      sum(when(matched && differs, 1L).otherwise(0L)).as("rows_updated"),
      sum(when(inserted, 1L).otherwise(0L)).as("rows_inserted"),
      sum(when(matched || inserted || kept, 1L).otherwise(0L)).as("total_rows"))
  }
}
