package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned parquet layout — the time-axis complement to
  * [[graft.operators.Layout.clusterByZ]]'s value-axis clustering and
  * the standard lakehouse table shape for an event/claims fact: one
  * `dt=YYYY-MM-DD/` directory per day, so any time-bounded query
  * prunes whole partitions at PLANNING time (Catalyst's
  * PartitionFilters — files outside the range are never listed into
  * the scan, which at 100 TB is the difference between touching a
  * day and touching a decade).
  *
  * Write shape: `repartition(dt [, buckets])` first, so each day
  * lands as a bounded file set instead of one file per (task × day)
  * — the small-files failure mode of naive partitioned writes.
  * Reference behavior: the incremental ingest loop appends day-keyed
  * batches; compaction stays per-partition.
  */
object PartitionedLake {

  val PartCol = "dt"

  /** Write `df` partitioned by the day of `ts`. `filesPerDay` bounds
    * the output file count per partition directory: rows shuffle on
    * (dt, salt) so each day spreads over at most `filesPerDay` writer
    * tasks (partitionBy then emits one file per day per task). Keying
    * on dt alone would hash every row of a day into ONE task
    * regardless of this knob.
    *
    * The salt is a DETERMINISTIC row-content hash over the hash-safe
    * columns (MapType anywhere in a column's type is excluded —
    * `hash` fails analysis on maps). A non-deterministic salt
    * (`rand()`, `monotonically_increasing_id()`) as a repartition key
    * is the SPARK-23207 bug class: on a stage retry rows re-salt
    * differently than the surviving shuffle outputs, duplicating or
    * losing rows in the written lake. The trade-off is accepted and
    * bounded: fully-duplicate rows co-bucket (mild write skew on
    * low-cardinality batches), but every retry re-derives the SAME
    * bucket for every row. */
  def writeByDay(df: DataFrame, dir: String, ts: Column,
                 filesPerDay: Int = 1): Unit = {
    val safeCols = df.schema.fields.filter(f => hashSafe(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    val salt =
      if (safeCols.isEmpty) lit(0) // all-map schema: one file per day
      else pmod(hash(safeCols: _*), lit(filesPerDay))
    // explicit partition count: a column-only repartition is fair game
    // for AQE partition coalescing, which would fold the salt groups
    // back into shared tasks and re-kill the knob on small batches
    val numParts = math.max(filesPerDay,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    df.withColumn(PartCol, date_format(ts, "yyyy-MM-dd"))
      .repartition(numParts, col(PartCol), salt)
      .write.mode("overwrite").partitionBy(PartCol).parquet(dir)
  }

  /** Read the lake back; `dt` comes back as a DATE partition column
    * (Spark's partition-type inference) — filters on it prune
    * directories before any file is opened. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Whether `hash()` accepts a column of this type (no MapType at any
    * nesting depth — Spark's HashExpression rejects maps because their
    * entry order is undefined). */
  private[sources] def hashSafe(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashSafe(f.dataType))
      case a: ArrayType => hashSafe(a.elementType)
      case _ => true
    }
  }
}
