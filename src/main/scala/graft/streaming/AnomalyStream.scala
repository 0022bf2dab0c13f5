package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Measures

/** Streaming anomaly monitor — the always-on leg of the
  * `g37_anomaly_days` batch query, on [[TrendingStream]]'s
  * architecture: per-(day, group) count/exact-decimal-sum registers
  * kept current by [[RollupStream]]'s replay-safe batch-keyed
  * partials (daily totals are additive state — the ONLY state the
  * stream holds), the trailing-baseline z-score computed AT READ TIME
  * by the batch operator itself over the folded days-sized frame.
  * Scoring at read rather than in the stream keeps state additive and
  * means one state store serves any (lookback, threshold) — and
  * because the read side IS `Measures.anomalousDays`, the streamed
  * report is definitionally identical to the batch report over the
  * same events (spec-asserted), today's total never laundering itself
  * into its own baseline either way. */
object AnomalyStream {

  /** Start folding the event stream into per-(day, group) registers
    * at `stateDir`. */
  def run(events: DataFrame, stateDir: String, checkpointDir: String,
          sumCol: String = "value"): StreamingQuery =
    RollupStream.run(
      events.withColumn("day", to_date(col("ts"))),
      stateDir, checkpointDir, Seq("day", "event_type"), Seq(sumCol))

  /** Current anomaly report: each day's total vs the trailing
    * `lookback`-day baseline per event type — `g37`'s exact output
    * shape. None before the first batch. */
  def readAnomalies(spark: SparkSession, stateDir: String,
                    lookback: Int = 7, zThreshold: Double = 3.0,
                    sumCol: String = "value"): Option[DataFrame] =
    RollupStream.read(spark, stateDir, Seq("day", "event_type"), Seq(sumCol))
      .map(daily => Measures.anomalousDays(daily, col("event_type"),
        col("day"), col(s"sum_$sumCol"), lookback, zThreshold))
}
