package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and right.ts <= left.ts — the standard temporal
  * lookup Spark has no built-in operator for (event → latest prior
  * state, trade → prevailing quote).
  *
  * Shape: interleave both sides into one frame tagged by side, sort
  * within each key on (ts, side, tiebreak) — right rows sort before
  * left rows at equal ts, making the match inclusive — and carry the
  * last right payload forward with last(ignoreNulls) over a running
  * window; keep only left rows. The payload travels as ONE struct
  * column (non-null for every right row, null for left rows), so a
  * legitimately-NULL payload FIELD is carried faithfully rather than
  * skipped in favor of an older right row — matching true as-of
  * semantics (DuckDB ASOF JOIN) for nullable payloads.
  *
  * Scale: ONE hash shuffle on the key plus a per-key local sort —
  * identical cost to a window aggregation; never builds the
  * (left × right-history) product a naive range join would. Right rows
  * must be unique per (key, ts) (pre-dedupe with
  * [[Dedup.latestByKeyAgg]]) or ties make the winner ambiguous; the
  * `tiebreak` column only orders right rows against each other within
  * an equal timestamp after such dedupe and may be a constant then.
  */
object AsOfJoin {

  /** @param keys        equi-join key columns (both sides)
    * @param leftTs      left timestamp column name
    * @param rightTs     right timestamp column name
    * @param rightPayload right columns to carry (renamed as given);
    *                    destinations must not collide with left columns
    * @param tiebreak    right column ordering rights within equal ts */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Map[String, String],
           tiebreak: String): DataFrame = {
    val outCols = rightPayload.values.toSeq
    val collisions = outCols.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"asOf payload destination(s) ${collisions.mkString(", ")} collide with left columns")
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          col(tiebreak).cast("long").as("__tb"),
          struct(rightPayload.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
            .as("__pay")): _*)
    // unionByName fills the side-specific columns (left's payload
    // struct, right's missing left columns) with nulls
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        outCols.map(c => col("__pay").getField(c).as(c)): _*)
  }
}
