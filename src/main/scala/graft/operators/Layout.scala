package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.BitSpread

/** Multi-dimensional data layout via Z-order (Morton) clustering — the
  * write-side half of file skipping at 100 TB.
  *
  * Parquet/lakehouse readers prune files and row groups with per-column
  * min/max stats; stats only help when the file layout correlates with
  * the filter columns. Sorting by one column gives perfect pruning on
  * it and none on the others. Interleaving the bits of several columns
  * into one z-value and range-partitioning + sorting by it bounds EVERY
  * interleaved column's min/max span per file (a z-range is a union of
  * small aligned hyper-rectangles), so predicates on any subset of the
  * layout columns skip most files — the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` (Morton 1966; the lakehouse use is public in
  * both projects' docs).
  *
  * Scale shape: [[zValue]] is a map-only codegen'd expression;
  * [[clusterByZ]] is exactly one range-shuffle (the same cost as the
  * total sort a single-column layout would pay) followed by a
  * partition-local sort. Nothing aggregates, nothing broadcasts.
  */
object Layout {

  /** Morton z-value of `cols`: bit `i` of column `d` lands at bit
    * `i * cols.size + d`. Each column is read in its low `bitsPer`
    * bits only (quantize/scale first; `bitsPer * cols.size <= 63`).
    * Map-only, whole-stage-codegen'd ([[graft.functions.BitSpread]]
    * per dimension + built-in shift/or). */
  def zValue(cols: Seq[Column], bitsPer: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bitsPer <= 63,
      s"${cols.size} cols x $bitsPer bits exceeds a signed long")
    cols.zipWithIndex.map { case (c, d) =>
      val spread = ColumnBridge.column(
        BitSpread(ColumnBridge.expression(c.cast("long")), cols.size, bitsPer))
      if (d == 0) spread else shiftleft(spread, d)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for multi-dimensional file skipping: one range
    * shuffle on the z-value into `numPartitions` write tasks, sorted
    * within each so row-group stats are tight too. Partitions hold
    * DISJOINT z-ranges (range partitioning), hence bounded per-file
    * min/max spans on every layout column. Write the result with
    * `.write.parquet(...)` — one output file per partition. */
  def clusterByZ(df: DataFrame, cols: Seq[Column], numPartitions: Int,
                 bitsPer: Int = 16): DataFrame = {
    val withZ = df.withColumn("__graft_z", zValue(cols, bitsPer))
    withZ.repartitionByRange(numPartitions, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }

  /** Dense sequential ids 0..n-1 in the total order of `order` —
    * WITHOUT the single-reducer `row_number().over(Window.orderBy(…))`
    * anti-pattern (a partition-less window funnels the whole corpus
    * through ONE task; Spark itself warns). The training-data staple:
    * contiguous example/shard ids over a 100 TB corpus.
    *
    * Scale shape = Spark's own global sort + the classic zipWithIndex
    * two-pass: one range shuffle on `order` (disjoint ordered key
    * ranges per partition), a partition-LOCAL sort, then a count pass
    * over partition iterators to fix offsets and a map pass to stamp
    * ids — every stage fully parallel, nothing corpus-sized on one
    * task. The imperative per-partition stamp is exactly the
    * documented RDD niche; everything before it is declarative.
    *
    * `order` must be a TOTAL order (append a unique id as tiebreak) —
    * that makes the output deterministic regardless of where the range
    * sampler places partition boundaries. Output: input columns +
    * `dense_id` (long). */
  def denseIds(df: DataFrame, order: Column*): DataFrame = {
    require(order.nonEmpty, "denseIds needs an ordering")
    val parted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val spark = df.sparkSession
    val out = org.apache.spark.sql.types.StructType(
      parted.schema.fields :+
        org.apache.spark.sql.types.StructField("dense_id",
          org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(
      parted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, out)
  }
}
