package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: match each point row to the interval
  * rows (same key) with start <= pt <= end. Spark plans the naive
  * `BETWEEN` join as a broadcast-nested-loop / cartesian per key —
  * quadratic in history length.
  *
  * Bucketized form: every interval is exploded to the coarse time
  * buckets it overlaps, points carry their single bucket, and the join
  * becomes an equi-join on (key, bucket) followed by the exact
  * BETWEEN filter. Each point matches an overlapping interval through
  * exactly one bucket (the point's own), so no dedup is needed.
  *
  * Scale: one hash shuffle each side on (key, bucket); cost scales
  * with points + interval-spans/bucketWidth. Choose `bucketWidthUs`
  * near the typical interval length: much smaller multiplies the
  * interval explosion, much larger packs unrelated rows into one
  * bucket (both still correct).
  */
object RangeJoin {

  /** @param points     point rows
    * @param intervals  interval rows
    * @param keys       equi-key columns present on both sides
    * @param pt         point timestamp column (on points)
    * @param start      interval start column (on intervals)
    * @param end        interval end column (on intervals), inclusive
    * @param bucketWidthUs bucket width in microseconds */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pt: String, start: String,
                      end: String, bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0)
    def bucket(c: Column): Column = floor(unix_micros(c) / bucketWidthUs)
    val iv = intervals.withColumn("__bkt",
      explode(sequence(bucket(col(start)), bucket(col(end)))))
    val p = points.withColumn("__bkt", bucket(col(pt)))
    p.join(iv, keys :+ "__bkt")
      .filter(col(pt) >= col(start) && col(pt) <= col(end))
      .drop("__bkt")
  }
}
