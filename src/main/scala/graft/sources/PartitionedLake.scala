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
    * the output file count per partition directory. */
  def writeByDay(df: DataFrame, dir: String, ts: Column,
                 filesPerDay: Int = 1): Unit =
    df.withColumn(PartCol, date_format(ts, "yyyy-MM-dd"))
      .repartition(filesPerDay, col(PartCol))
      .write.mode("overwrite").partitionBy(PartCol).parquet(dir)

  /** Read the lake back; `dt` comes back as a DATE partition column
    * (Spark's partition-type inference) — filters on it prune
    * directories before any file is opened. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
