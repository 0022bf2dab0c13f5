package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the versioned
  * complement of [[Merge]]'s Type-1 upsert (reference:
  * sp_upsert_claims.sql overwrites in place; SCD2 is the standard
  * warehouse move when history must survive): every attribute change
  * CLOSES the key's open version (`effective_to` = change time) and
  * opens a new one, so a fact row can always join the dimension AS OF
  * its own date.
  *
  * Batch semantics (incremental-safe, proven by applying batches
  * sequentially vs one-shot in the spec and the driver oracle):
  * updates are ordered per key by (ts, tie...), consecutive no-change
  * rows collapse, a first update equal to the key's open version is a
  * no-op (the open version simply keeps running), surviving updates
  * chain into [ts, next ts) intervals, and the last one stays open
  * (`effective_to` null, `is_current` true).
  *
  * Scale: everything is keyed by the dimension key — two window passes
  * over the BATCH (batch-sized, not table-sized), one equi-join of the
  * batch against the current table's open slice, one union. The
  * current table is never globally sorted or windowed, so a 100 TB dim
  * with a small daily change feed costs O(batch log batch + batch ⋈
  * table). Pair with a [[graft.sources.SnapshotStore]] MERGE keyed on
  * (keys..., effective_from) to persist each round.
  */
object Scd2 {

  val VersionCols: Seq[String] = Seq("effective_from", "effective_to", "is_current")

  /** Initialize an empty SCD2 table with `keys ++ tracked` + version
    * columns, typed from a template updates frame. */
  def empty(updates: DataFrame, keys: Seq[String], tracked: Seq[String],
            tsCol: String): DataFrame =
    updates.select(
      (keys ++ tracked).map(col) :+
        col(tsCol).as("effective_from") :+
        col(tsCol).as("effective_to") :+
        lit(true).as("is_current"): _*)
      .limit(0)

  /** Apply a change batch to the current SCD2 table.
    *
    * @param current SCD2 table: keys ++ tracked ++ VersionCols
    * @param updates change feed: keys ++ tracked ++ tsCol (++ tieCols)
    * @param tieCols extra columns making the per-key order total when
    *                ts alone can collide (e.g. a source row id)
    */
  def applyChanges(current: DataFrame, updates: DataFrame,
                   keys: Seq[String], tracked: Seq[String],
                   tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    def sameAs(prefix: String): Column =
      tracked.map(t => col(t) <=> col(s"$prefix$t")).reduce(_ && _)

    // 1. intra-batch: drop consecutive no-change rows
    val deduped = tracked.foldLeft(
        updates.select((keys ++ tracked :+ tsCol) ++ tieCols map col: _*)) {
        (df, t) => df.withColumn(s"__p$t", lag(col(t), 1).over(w))
      }
      .withColumn("__first", lag(col(tsCol), 1).over(w).isNull)
      .filter(col("__first") || !sameAs("__p"))

    // 2. cross-batch: a first surviving update equal to the key's OPEN
    // version is a no-op — the open version keeps running
    val open = current.filter(col("is_current"))
      .select(keys.map(col) ++ tracked.map(t => col(t).as(s"__o$t")) :+
        lit(true).as("__has_open"): _*)
    val kept = deduped
      .withColumn("__rn", row_number().over(w))
      .join(open, keys, "left")
      .filter(!(col("__rn") === 1 && coalesce(col("__has_open"), lit(false))
        && sameAs("__o")))

    // 3. chain surviving updates into versions
    val versions = kept
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select((keys ++ tracked ++ VersionCols).map(col): _*)

    // 4. close open versions of keys that gained a new version
    val firstNew = versions.groupBy(keys.map(col): _*)
      .agg(min(col("effective_from")).as("__close_at"))
    val closed = current.join(firstNew, keys, "left")
      .withColumn("effective_to",
        when(col("is_current") && col("__close_at").isNotNull, col("__close_at"))
          .otherwise(col("effective_to")))
      .withColumn("is_current", col("is_current") && col("__close_at").isNull)
      .drop("__close_at")

    closed.unionByName(versions)
  }

  /** Join each fact row to the dimension version valid AS OF the
    * fact's own date — the lookup the scaladoc above promises and the
    * step every SCD2 consumer otherwise hand-rolls: the version with
    * `effective_from <= factTs < effective_to` (open versions have no
    * upper bound). Facts dated before the key's first version get NULL
    * dimension attributes.
    *
    * Built on [[AsOfJoin.asOf]]'s interleave posture (st3): ONE hash
    * shuffle on the key + a per-key sort — never the fact × version-
    * history product of a naive range join. Zero-length versions
    * (`effective_from == effective_to`, produced when several same-key
    * changes share a timestamp) are invisible to every as-of query and
    * are dropped up front — which also makes the surviving versions
    * unique per (key, effective_from), the uniqueness [[AsOfJoin]]
    * requires. A carried version whose `effective_to` has passed the
    * fact date (a gap or retired key) is nulled out rather than
    * returned stale.
    *
    * @param fact    fact frame; must contain `keys` and `factTs`
    * @param factTs  fact-side event date/timestamp column name
    * @param dim     SCD2 table: keys ++ tracked ++ [[VersionCols]]
    * @param prefix  prepended to the carried dimension columns
    *                (`tracked` + effective_from/effective_to) so they
    *                never collide with fact columns */
  def asOfJoin(fact: DataFrame, factTs: String, dim: DataFrame,
               keys: Seq[String], tracked: Seq[String],
               prefix: String = "dim_"): DataFrame = {
    val live = dim.filter(col("effective_to").isNull ||
      col("effective_from") < col("effective_to"))
    val payload = (tracked ++ Seq("effective_from", "effective_to"))
      .map(c => c -> s"$prefix$c").toMap
    val joined = AsOfJoin.asOf(fact, live, keys,
      factTs, "effective_from", payload, tiebreak = "is_current")
    // a version that ENDED before the fact date must not leak forward;
    // materialize the flag BEFORE nulling any payload column (the check
    // reads one of them)
    val flagged = joined.withColumn("__stale",
      coalesce(col(s"${prefix}effective_to").isNotNull &&
        col(factTs) >= col(s"${prefix}effective_to"), lit(false)))
    payload.values.foldLeft(flagged) { (df, c) =>
      df.withColumn(c, when(!col("__stale"), col(c)))
    }.drop("__stale")
  }
}
