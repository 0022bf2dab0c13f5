package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Incrementally-maintained aggregate table — the O(batch) gold
  * refresh. The reference's nightly loop recomputes its gold rollups
  * from the full silver fact after every MERGE
  * (fabric/claims/gold/WHclaims_gold.Warehouse sp_upsert_claims.sql +
  * the measure views); at 100 TB that rereads the world to absorb a
  * million-row delta. This operator keeps the ADDITIVE state instead —
  * per-group count + exact decimal sums, the classic partial-aggregate
  * / materialized-view-maintenance decomposition — so each batch costs
  * one batch-sized partial aggregation plus a |groups|-sized state
  * merge, independent of history size.
  *
  * Only additive measures live in the state (count, sum; avg derives
  * as sum/n at read time). Non-additive measures need mergeable
  * sketches — HLL for distinct counts, GK for percentiles — exactly
  * the g14/g14b family; swap those registers into the state the same
  * way. Deletes/updates are out of scope: the feed contract is
  * append-only deltas (retractions would need signed rows, which the
  * same state shape supports by summing negative contributions).
  *
  * State lives in a [[SnapshotStore]]: versioned, atomically swapped,
  * time-travelable — a bad batch diffs against v-1 via
  * `SnapshotStore.changes`.
  */
object IncrementalAgg {

  private def normalize(df: DataFrame, sumCols: Seq[String]): DataFrame =
    df.select(
      (df.columns.filterNot(c => c == "n" || c.startsWith("sum_")).map(col) :+
        col("n").cast("long").as("n")) ++
        sumCols.map(c => col(s"sum_$c").cast("decimal(28,4)").as(s"sum_$c")): _*)

  /** One batch's additive registers: per-group count + exact decimal
    * sums, normalized to the stable state schema. */
  def partial(batch: DataFrame, groupCols: Seq[String],
              sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && sumCols.nonEmpty,
      "need at least one group column and one sum column")
    // "n" and "sum_*" are the state's register names — a group column
    // shadowing them would be miscategorized by the schema normalizer
    require(groupCols.forall(c => c != "n" && !c.startsWith("sum_")),
      s"group columns must not be named 'n' or start with 'sum_': $groupCols")
    val aggs = count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c).cast("decimal(18,4)")).as(s"sum_$c"))
    normalize(
      batch.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*),
      sumCols)
  }

  /** Merge any pile of partial-register rows (state + a new partial,
    * or many per-batch partials) back into one row per group: sums of
    * sums, exact. */
  def fold(registers: DataFrame, groupCols: Seq[String],
           sumCols: Seq[String]): DataFrame = {
    val reAggs = sum(col("n")).as("n") +:
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    normalize(
      registers.groupBy(groupCols.map(col): _*).agg(reAggs.head, reAggs.tail: _*),
      sumCols)
  }

  /** Fold an append-only `batch` into the aggregate state at `dir`:
    * partial-aggregate the batch on `groupCols` (count + exact decimal
    * sums of `sumCols`), merge with the stored per-group state by
    * summing, commit as the next version. Returns that version.
    * Decimal arithmetic keeps every sum exact and order-independent,
    * so N incremental batches land bit-identical to one full
    * recompute (spec-asserted). NOT replay-idempotent — feeding the
    * same batch twice double-counts; an at-least-once source goes
    * through [[graft.streaming.RollupStream]]'s batch-keyed partials
    * instead. */
  def update(batch: DataFrame, dir: String, groupCols: Seq[String],
             sumCols: Seq[String]): Int = {
    val p = partial(batch, groupCols, sumCols)
    val merged = SnapshotStore.read(batch.sparkSession, dir) match {
      case Some(state) => fold(state.unionByName(p), groupCols, sumCols)
      case None => p
    }
    SnapshotStore.commit(merged, dir)
  }

  /** The current aggregate state (group cols, `n`, `sum_<c>`...), or
    * None before the first batch. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    SnapshotStore.read(spark, dir)
}
