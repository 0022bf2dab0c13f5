package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The table-format seam: every row-level operation graft's pipelines
  * need from a transactional lake table, as ONE small trait — so the
  * storage backend is a deploy-time choice, not something the
  * operators know about. [[SnapshotTable]] (below) is the bundled
  * implementation over [[SnapshotStore]]'s versioned-parquet protocol;
  * a Delta Lake implementation is a thin wrapper over delta-spark
  * (unresolvable in this build environment — no network, and the jar
  * is not in the local cache — so the MAPPING is documented here,
  * method by method, instead of shipped untested; last re-checked
  * 2026-08-15: no io.delta artifacts under the coursier cache,
  * ~/.ivy2, or /opt/spark/jars).
  *
  * Reference behavior this seam stands in for: the Delta MERGE loop of
  * fabric-claims' bronze notebook
  * (fabric/claims/bronze/NBclaims_bronze.Notebook/notebook-content.py:215-227)
  * and the lakehouse tables every downstream layer reads.
  *
  * == SnapshotStore op → Delta Lake op (the deploy mapping) ==
  *
  *  - `read` → `spark.read.format("delta").load(path)`
  *  - `readVersion(v)` → `.option("versionAsOf", v)` (time travel);
  *    SnapshotStore prunes old versions on [[compact]], Delta on
  *    `VACUUM` — both make old versions unreadable past retention
  *  - `commit(df)` → `df.write.format("delta").mode("overwrite")
  *    .save(path)` (one atomic new version, like the pointer swap)
  *  - `mergeInto(batch, keys)` → `DeltaTable.merge(batch, <keys
  *    equality>).whenMatched.updateAll.whenNotMatched.insertAll` with
  *    `spark.databricks.delta.schema.autoMerge.enabled` matching
  *    `evolveSchema` (same union-of-schemas semantics)
  *  - `deleteWhere(cond)` → `DeltaTable.delete(cond)`; NULL-cond rows
  *    survive in both (SQL three-valued DELETE)
  *  - `updateWhere(cond, assignments)` → `DeltaTable.update(cond,
  *    assignments)`; assignments read the original row in both
  *  - `replaceGroups(batch, groupKeys)` → MERGE on the group keys
  *    with `whenMatchedDelete` + append, or (simpler, same result)
  *    `DELETE WHERE groupKey IN (keySource)` then append — one
  *    transaction each way
  *  - `changes(fromV, toV, keys)` → Change Data Feed:
  *    `.option("readChangeFeed", true).option("startingVersion",
  *    fromV+1).option("endingVersion", toV)`; note Delta's CDF emits
  *    per-COMMIT change rows (insert/update_postimage/delete as
  *    `_change_type`) while SnapshotStore diffs the two endpoint
  *    snapshots — net-of-intermediate-churn. Aggregating Delta's feed
  *    by key (latest change wins) reconciles the two.
  *  - `compact(numFiles, retain)` → `OPTIMIZE` (file compaction) +
  *    `VACUUM ... RETAIN` (version pruning); Delta splits the two
  *    concerns, SnapshotStore does both in one maintenance pass
  *  - single-writer contract → Delta lifts it: its commit protocol
  *    takes optimistic-concurrency conflicts per table, so the
  *    "run compact from the merge loop" caveat disappears
  *
  * What Delta adds that this seam deliberately does NOT model:
  * constraint enforcement, generated columns, deletion vectors, and
  * liquid clustering — none are load-bearing for graft's operators
  * ([[graft.operators.Layout.clusterByZ]] covers the clustering use
  * case format-independently).
  */
trait LakehouseTable {

  /** The current snapshot, if any version has been committed. */
  def read(spark: SparkSession): Option[DataFrame]

  /** Time-travel read of a retained version. */
  def readVersion(spark: SparkSession, version: Int): Option[DataFrame]

  /** Replace the table content atomically; returns the new version. */
  def commit(df: DataFrame): Int

  /** Upsert keyed on `keys` (whenMatchedUpdateAll /
    * whenNotMatchedInsertAll); first batch bootstraps the table. */
  def mergeInto(batch: DataFrame, keys: Seq[String],
                evolveSchema: Boolean = true): Int

  /** DELETE WHERE cond (three-valued: NULL-cond rows survive). */
  def deleteWhere(spark: SparkSession, cond: Column): Option[Int]

  /** UPDATE SET assignments WHERE cond (assignments read the
    * original row). */
  def updateWhere(spark: SparkSession, cond: Column,
                  assignments: Map[String, Column]): Option[Int]

  /** MERGE that fully replaces each touched group (see
    * [[SnapshotStore.replaceGroups]] for the shrink-safety contract). */
  def replaceGroups(batch: DataFrame, groupKeys: Seq[String],
                    keySource: Option[DataFrame] = None): Int

  /** Change feed between two retained versions. */
  def changes(spark: SparkSession, fromV: Int, toV: Int,
              keys: Seq[String]): Option[DataFrame]

  /** Compact current files and prune versions behind the retention
    * window. */
  def compact(spark: SparkSession, numFiles: Int = 1,
              retain: Int = 1): Option[Int]
}

/** [[LakehouseTable]] over the bundled versioned-parquet protocol —
  * pure delegation; the trait's semantics ARE [[SnapshotStore]]'s
  * (spec: parity with direct SnapshotStore calls on the same dir). */
final case class SnapshotTable(dir: String) extends LakehouseTable {
  def read(spark: SparkSession): Option[DataFrame] =
    SnapshotStore.read(spark, dir)
  def readVersion(spark: SparkSession, version: Int): Option[DataFrame] =
    SnapshotStore.readVersion(spark, dir, version)
  def commit(df: DataFrame): Int = SnapshotStore.commit(df, dir)
  def mergeInto(batch: DataFrame, keys: Seq[String],
                evolveSchema: Boolean = true): Int =
    SnapshotStore.mergeInto(batch, dir, keys, evolveSchema)
  def deleteWhere(spark: SparkSession, cond: Column): Option[Int] =
    SnapshotStore.deleteWhere(spark, dir, cond)
  def updateWhere(spark: SparkSession, cond: Column,
                  assignments: Map[String, Column]): Option[Int] =
    SnapshotStore.updateWhere(spark, dir, cond, assignments)
  def replaceGroups(batch: DataFrame, groupKeys: Seq[String],
                    keySource: Option[DataFrame] = None): Int =
    SnapshotStore.replaceGroups(batch, dir, groupKeys, keySource)
  def changes(spark: SparkSession, fromV: Int, toV: Int,
              keys: Seq[String]): Option[DataFrame] =
    SnapshotStore.changes(spark, dir, fromV, toV, keys)
  def compact(spark: SparkSession, numFiles: Int = 1,
              retain: Int = 1): Option[Int] =
    SnapshotStore.compact(spark, dir, numFiles, retain)
}
