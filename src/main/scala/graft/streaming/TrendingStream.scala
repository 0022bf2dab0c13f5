package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming trending top-k — the always-on leg of the st6 trending
  * query: per-hour event-type counts kept current by [[RollupStream]]'s
  * replay-safe batch-keyed registers (counts are additive state), the
  * top-k cut applied AT READ TIME over the folded counts. Ranking at
  * read rather than in the stream keeps the streaming state additive
  * (a top-k set is not mergeable across batches without keeping the
  * full counts anyway) and means one state store serves any k.
  *
  * The read-side cut is written as the naive ranked window on purpose:
  * it rides `WindowTopOneRewrite`'s partitioned rn<=k path into the
  * bounded-heap TopKRows aggregate — no Window exec, no per-hour sort
  * (the same plan st6's batch twin is spec-asserted to produce). */
object TrendingStream {

  /** Start folding the event stream into per-(hour, event_type) count
    * registers at `stateDir`. `sumCol` also accumulates an exact
    * decimal sum (e.g. revenue) alongside the count. */
  def run(events: DataFrame, stateDir: String, checkpointDir: String,
          sumCol: String = "value"): StreamingQuery =
    RollupStream.run(
      events.withColumn("hr", date_trunc("hour", col("ts"))),
      stateDir, checkpointDir, Seq("hr", "event_type"), Seq(sumCol))

  /** Current trending top-k event types per hour (count desc, type
    * tiebreak). None before the first batch. */
  def readTopK(spark: SparkSession, stateDir: String, k: Int,
               sumCol: String = "value"): Option[DataFrame] =
    RollupStream.read(spark, stateDir, Seq("hr", "event_type"), Seq(sumCol))
      .map { counts =>
        val w = Window.partitionBy(col("hr"))
          .orderBy(col("n").desc, col("event_type"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select("hr", "event_type", "n")
      }
}
