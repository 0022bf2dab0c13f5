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
    * (dt, salt) with a ROW-LOCAL salt (hashed per-row unique id), so
    * each day spreads over at most `filesPerDay` writer tasks
    * (partitionBy then emits one file per day per task). Keying on dt
    * alone would hash every row of a day into ONE task regardless of
    * this knob. The salt deliberately does NOT hash the row's columns:
    * `hash(<all cols>)` fails analysis on MapType columns and sends
    * fully-duplicate rows to one bucket, quietly defeating the spread
    * on low-cardinality batches. */
  def writeByDay(df: DataFrame, dir: String, ts: Column,
                 filesPerDay: Int = 1): Unit = {
    val salt = pmod(hash(monotonically_increasing_id()), lit(filesPerDay))
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
}
