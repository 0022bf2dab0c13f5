package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.Events.Event

/** Streaming funnel conversion — the always-on twin of the
  * `g32_window_funnel` batch query (reference analog: the measure pack
  * counts claim-status progressions after the fact; this emits each
  * conversion AS IT COMPLETES, the alerting/activation form a growth
  * pipeline actually runs): per user, walk the ordered step list and
  * emit one record the moment the final step lands, where every step
  * must occur within `windowSeconds` of the PREVIOUS step (the same
  * per-step deadline `Events.windowFunnel` applies — a user can take
  * an hour overall if each hop is fast).
  *
  * Semantics vs the batch form: the batch query scans a complete log
  * and picks each user's earliest qualifying chain; the stream applies
  * the identical transition rule to events as they arrive (sorted
  * within each micro-batch by (ts, event_id)). For in-order delivery
  * inside the watermark the final-step conversions match the batch
  * earliest-chain exactly (spec-checked); a stalled funnel times out
  * via event-time timeout at `lastTs + windowSeconds` and the state is
  * dropped without emission — funnels report conversions, not
  * abandonments. Out-of-window or out-of-order step arrivals simply
  * don't advance the chain, mirroring the batch `where` gate.
  *
  * Scale: state is ONE small record per user currently inside the
  * funnel (step index + two timestamps); the event-time timeout plus
  * the watermark bound state growth at production fan-in — abandoned
  * users leave the store after one window, completed users leave
  * immediately. One keyed shuffle per micro-batch (groupByKey on
  * user), no corpus-sized state scan. */
object FunnelStream {

  /** step = 1-based index of the furthest step reached;
    * firstTs/lastTs = epoch millis of the chain's first/latest step. */
  case class FunnelState(step: Int, firstTs: Long, lastTs: Long)

  case class Conversion(user_id: Long, started: Timestamp,
                        converted: Timestamp, seconds: Double)

  /** Conversions stream: one row per user completing all `steps`,
    * each hop within `windowSeconds` of the previous step. */
  def conversions(events: Dataset[Event], steps: Seq[String],
                  windowSeconds: Long,
                  watermark: String = "1 hour"): Dataset[Conversion] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(windowSeconds > 0, s"invalid windowSeconds=$windowSeconds")
    import events.sparkSession.implicits._
    val windowMs = windowSeconds * 1000L
    val stepIdx = steps.zipWithIndex.toMap
    events
      .filter(e => stepIdx.contains(e.event_type))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // abandoned mid-funnel: drop silently (no emission)
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            // Expire a stale chain BEFORE folding this batch's events: a
            // chain whose deadline is already behind the watermark can
            // never be extended (any in-window event is now dropped as
            // late), so treating it as alive would swallow a fresh
            // first-step event arriving in this same micro-batch — the
            // batch form would have started the earlier chain. Filtering
            // here lets that event open a new chain immediately; the
            // post-loop guard still handles chains that go stale within
            // the batch.
            var cur = state.getOption
              .filter(s => s.lastTs + windowMs > state.getCurrentWatermarkMs())
            val out = Seq.newBuilder[Conversion]
            sorted.foreach { e =>
              val t = e.ts.getTime
              val i = stepIdx(e.event_type)
              cur match {
                case None if i == 0 =>
                  cur = Some(FunnelState(1, t, t))
                case Some(s) if i == s.step &&
                    t >= s.lastTs && t <= s.lastTs + windowMs =>
                  if (s.step + 1 == steps.size) {
                    out += Conversion(userId, new Timestamp(s.firstTs),
                      new Timestamp(t), (t - s.firstTs) / 1000.0)
                    cur = None // one conversion per chain; restart fresh
                  } else cur = Some(FunnelState(s.step + 1, s.firstTs, t))
                case _ => // wrong step, out of window, or late re-entry:
                          // the chain keeps its earliest qualifying state
              }
            }
            cur match {
              case Some(s) =>
                // A chain kept alive only by wrong-step/out-of-window
                // arrivals can retain a stale lastTs whose deadline the
                // event-time watermark has already passed; registering
                // that past deadline as a timeout throws in
                // GroupStateImpl (and checkpoint replay re-crashes).
                // Such a chain can never be extended — any event inside
                // its window is now behind the watermark and dropped —
                // so expire it here, exactly as the timeout would have.
                val deadline = s.lastTs + windowMs
                if (deadline <= state.getCurrentWatermarkMs()) {
                  if (state.exists) state.remove()
                } else {
                  state.update(s)
                  state.setTimeoutTimestamp(deadline)
                }
              case None => if (state.exists) state.remove()
            }
            out.result().iterator
          }
      }
  }
}
