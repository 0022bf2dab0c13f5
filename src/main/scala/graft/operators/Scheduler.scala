package graft.operators

import java.time._
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Schedule evaluation — the computable half of the reference's
  * trigger config (`fabric/claims/orchestration/PLclaims_master
  * .DataPipeline/.schedules`: `schedules[]` entries with `enabled`,
  * `jobType`, and a `configuration` of `type` Daily/Weekly/Cron,
  * `startDateTime`/`endDateTime`, `localTimeZoneId`, and `times` /
  * `weekdays` / `interval`). The platform half — a resident process
  * that sleeps until the next occurrence — stays platform territory
  * ([[PipelineRunner]]'s declared boundary; nothing here sleeps or
  * polls). What IS library-shaped is the pure time arithmetic: which
  * instants a schedule fires at, which occurrences a pipeline has
  * missed given its run ledger, and the replay-safe catch-up that
  * turns those into [[PipelineRunner]] runs. A host cron/systemd timer
  * ticking `runDue(now)` at ANY cadence at least as fine as the
  * schedule yields exactly one run per occurrence — the tick cadence
  * never changes WHAT runs, only how promptly.
  *
  * All arithmetic is in the schedule's own timezone via `java.time`
  * zone rules, so DST is handled the way the platform handles it: a
  * local time erased by a spring-forward gap resolves forward by the
  * gap length, and an ambiguous fall-back time resolves to the earlier
  * offset (`LocalDateTime.atZone` resolution — deterministic and
  * documented). Occurrence instants are therefore NOT 24 h apart
  * across a DST boundary, by design.
  */
sealed trait Recurrence
object Recurrence {
  /** Fires at each of `times` every day. */
  final case class Daily(times: Seq[LocalTime]) extends Recurrence {
    require(times.nonEmpty, "Daily schedule with no times")
  }
  /** Fires at each of `times` on each listed weekday. */
  final case class Weekly(weekdays: Seq[DayOfWeek], times: Seq[LocalTime])
      extends Recurrence {
    require(weekdays.nonEmpty, "Weekly schedule with no weekdays")
    require(times.nonEmpty, "Weekly schedule with no times")
  }
  /** Fires every `intervalMinutes` from the schedule's start — the
    * wire shape's `"type": "Cron"` (a fixed-interval trigger, not a
    * cron expression). Interval arithmetic is on the INSTANT of the
    * start, so a 15-minute schedule stays 15 physical minutes apart
    * across DST transitions. */
  final case class ByMinutes(intervalMinutes: Int) extends Recurrence {
    require(intervalMinutes >= 1, s"interval $intervalMinutes < 1 minute")
  }
}

/** One schedule entry. `start`/`end` are the wire shape's local-time
  * window bounds, both INCLUSIVE (an occurrence exactly at either
  * bound fires), interpreted in `zone`. */
final case class Schedule(
    enabled: Boolean,
    jobType: String,
    recurrence: Recurrence,
    start: LocalDateTime,
    end: LocalDateTime,
    zone: ZoneId) {
  require(!end.isBefore(start), s"end $end before start $start")

  private def startInstant: Instant = start.atZone(zone).toInstant
  private def endInstant: Instant = end.atZone(zone).toInstant

  /** Occurrence instants in `(fromExclusive, toInclusive]`, ascending.
    * Half-open on the left so catch-up composes: the occurrences due
    * since a last fire are exactly `occurrencesBetween(lastFire, now)`
    * — no double-fire at the boundary. Disabled schedules have no
    * occurrences. */
  def occurrencesBetween(fromExclusive: Instant,
                         toInclusive: Instant): Seq[Instant] = {
    if (!enabled || !toInclusive.isAfter(fromExclusive)) return Nil
    val lo = if (startInstant.isAfter(fromExclusive)) startInstant.minusNanos(1)
             else fromExclusive
    val hi = if (endInstant.isBefore(toInclusive)) endInstant else toInclusive
    if (!hi.isAfter(lo)) return Nil
    recurrence match {
      case Recurrence.ByMinutes(n) =>
        val step = n.toLong * 60
        val s0 = startInstant.getEpochSecond
        // first k with occurrence strictly after lo (lo >= s0 - 1ns)
        val k0 = math.max(0L,
          Math.floorDiv(lo.getEpochSecond - s0, step) + 1)
        Iterator.from(0)
          .map(i => Instant.ofEpochSecond(s0 + (k0 + i) * step))
          .takeWhile(!_.isAfter(hi))
          .toSeq
      case _ =>
        val (days, times) = recurrence match {
          case Recurrence.Daily(ts) => (DayOfWeek.values.toSeq, ts)
          case Recurrence.Weekly(ds, ts) => (ds, ts)
          case _ => throw new MatchError(recurrence) // unreachable
        }
        val daySet = days.toSet
        val sorted = times.sorted
        // iterate local DATES spanning the instant window (pad a day
        // each side — zone offsets move a local date by < 1 day)
        val d0 = lo.atZone(zone).toLocalDate.minusDays(1)
        val d1 = hi.atZone(zone).toLocalDate.plusDays(1)
        Iterator.iterate(d0)(_.plusDays(1))
          .takeWhile(!_.isAfter(d1))
          .filter(d => daySet.contains(d.getDayOfWeek))
          .flatMap(d => sorted.map(t =>
            LocalDateTime.of(d, t).atZone(zone).toInstant))
          .filter(i => i.isAfter(lo) && !i.isAfter(hi) &&
            !i.isBefore(startInstant) && !i.isAfter(endInstant))
          .toSeq.sorted
    }
  }

  /** The latest occurrence ≤ `t`, if any — computed arithmetically for
    * interval schedules (no enumeration of a long-dead schedule's
    * history) and by an 8-day-lookback for day-of-week ones. */
  def lastNotAfter(t: Instant): Option[Instant] = {
    if (!enabled || t.isBefore(startInstant)) return None
    val hi = if (endInstant.isBefore(t)) endInstant else t
    recurrence match {
      case Recurrence.ByMinutes(n) =>
        val step = n.toLong * 60
        val s0 = startInstant.getEpochSecond
        val k = Math.floorDiv(hi.getEpochSecond - s0, step)
        if (k < 0) None else Some(Instant.ofEpochSecond(s0 + k * step))
      case _ =>
        // any non-empty day set fires within any 8-day local span
        occurrencesBetween(hi.minusSeconds(8L * 86400), hi).lastOption
    }
  }

  /** The next occurrence strictly after `t`, if any remains inside the
    * schedule window. */
  def nextAfter(t: Instant): Option[Instant] = {
    if (!enabled) return None
    val from = if (t.isBefore(startInstant)) startInstant.minusNanos(1) else t
    recurrence match {
      case Recurrence.ByMinutes(n) =>
        val step = n.toLong * 60
        val s0 = startInstant.getEpochSecond
        val k0 = math.max(0L, Math.floorDiv(from.getEpochSecond - s0, step) + 1)
        val next = Instant.ofEpochSecond(s0 + k0 * step)
        if (next.isAfter(endInstant)) None else Some(next)
      case _ =>
        // scan forward a week at a time (every Daily/Weekly schedule
        // with a non-empty day set fires within any 7-day span)
        Iterator.iterate(from)(_.plusSeconds(7L * 86400))
          .takeWhile(_.isBefore(endInstant.plusSeconds(7L * 86400)))
          .map(w => occurrencesBetween(w,
            if (w.plusSeconds(7L * 86400).isAfter(endInstant)) endInstant
            else w.plusSeconds(7L * 86400)))
          .collectFirst { case occ if occ.nonEmpty => occ.head }
    }
  }
}

object Scheduler {

  /** Windows timezone ids → IANA, for the wire shape's
    * `localTimeZoneId` (the reference uses `"Eastern Standard Time"`,
    * .schedules:12). IANA ids pass through; anything else fails fast
    * — a schedule in an unmapped zone firing at the wrong offset is
    * strictly worse than a load error. */
  private val windowsZones: Map[String, String] = Map(
    "Dateline Standard Time" -> "Etc/GMT+12",
    "Hawaiian Standard Time" -> "Pacific/Honolulu",
    "Alaskan Standard Time" -> "America/Anchorage",
    "Pacific Standard Time" -> "America/Los_Angeles",
    "Mountain Standard Time" -> "America/Denver",
    "US Mountain Standard Time" -> "America/Phoenix",
    "Central Standard Time" -> "America/Chicago",
    "Eastern Standard Time" -> "America/New_York",
    "US Eastern Standard Time" -> "America/Indiana/Indianapolis",
    "Atlantic Standard Time" -> "America/Halifax",
    "SA Eastern Standard Time" -> "America/Cayenne",
    "E. South America Standard Time" -> "America/Sao_Paulo",
    "UTC" -> "UTC",
    "GMT Standard Time" -> "Europe/London",
    "W. Europe Standard Time" -> "Europe/Berlin",
    "Romance Standard Time" -> "Europe/Paris",
    "Central Europe Standard Time" -> "Europe/Budapest",
    "Central European Standard Time" -> "Europe/Warsaw",
    "FLE Standard Time" -> "Europe/Kiev",
    "Russian Standard Time" -> "Europe/Moscow",
    "Israel Standard Time" -> "Asia/Jerusalem",
    "Arabian Standard Time" -> "Asia/Dubai",
    "India Standard Time" -> "Asia/Kolkata",
    "SE Asia Standard Time" -> "Asia/Bangkok",
    "Singapore Standard Time" -> "Asia/Singapore",
    "China Standard Time" -> "Asia/Shanghai",
    "Tokyo Standard Time" -> "Asia/Tokyo",
    "Korea Standard Time" -> "Asia/Seoul",
    "AUS Eastern Standard Time" -> "Australia/Sydney",
    "E. Australia Standard Time" -> "Australia/Brisbane",
    "New Zealand Standard Time" -> "Pacific/Auckland")

  def zoneOf(id: String): ZoneId =
    windowsZones.get(id).map(ZoneId.of).getOrElse(
      try ZoneId.of(id)
      catch {
        case _: DateTimeException => throw new IllegalArgumentException(
          s"unknown timezone id '$id' (not a mapped Windows id or IANA id)")
      })

  /** Parse the `.schedules` wire shape (see the reference file cited
    * on the class doc): `{"schedules": [{"enabled": …, "jobType": …,
    * "configuration": {"type": "Daily"|"Weekly"|"Cron", "startDateTime"
    * : …, "endDateTime": …, "localTimeZoneId": …, "times": […] |
    * "weekdays": […] | "interval": N}}]}`. Unknown `type` values and
    * missing fields fail at load ([[VariableLibrary.fromJson]]'s
    * fail-fast contract). Rides Spark's bundled Jackson. */
  def fromJson(json: String): Seq[Schedule] = {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    val arr = root.get("schedules")
    require(arr != null && arr.isArray, "missing 'schedules' array")
    arr.elements().asScala.map { e =>
      val conf = e.get("configuration")
      require(conf != null && conf.isObject,
        "schedule entry without a 'configuration'")
      def text(field: String): String = {
        val n = conf.get(field)
        require(n != null && n.isTextual,
          s"configuration missing text field '$field'")
        n.asText
      }
      val times = Option(conf.get("times")).map(ts =>
        ts.elements().asScala.map(t => LocalTime.parse(t.asText)).toSeq)
      val rec = text("type") match {
        case "Daily" => Recurrence.Daily(times.getOrElse(
          throw new IllegalArgumentException("Daily schedule without 'times'")))
        case "Weekly" =>
          val wd = Option(conf.get("weekdays")).map(ws =>
            ws.elements().asScala.map(w =>
              DayOfWeek.valueOf(w.asText.toUpperCase)).toSeq)
          Recurrence.Weekly(
            wd.getOrElse(throw new IllegalArgumentException(
              "Weekly schedule without 'weekdays'")),
            times.getOrElse(throw new IllegalArgumentException(
              "Weekly schedule without 'times'")))
        case "Cron" =>
          val iv = conf.get("interval")
          require(iv != null && iv.isNumber,
            "Cron schedule without a numeric 'interval'")
          Recurrence.ByMinutes(iv.asInt)
        case other => throw new IllegalArgumentException(
          s"unknown schedule type '$other'")
      }
      Schedule(
        enabled = e.get("enabled") != null && e.get("enabled").asBoolean(),
        jobType = Option(e.get("jobType")).map(_.asText).getOrElse("Execute"),
        recurrence = rec,
        start = LocalDateTime.parse(text("startDateTime")),
        end = LocalDateTime.parse(text("endDateTime")),
        zone = zoneOf(text("localTimeZoneId")))
    }.toSeq
  }

  /** Occurrences due across `schedules` in `(lastFire, now]`,
    * ascending and de-duplicated (two schedules landing on the same
    * instant is one run — the occurrence, not the schedule entry, is
    * the unit of work). With NO ledger (`lastFire` empty) this
    * bootstraps with the single most recent occurrence ≤ now — a new
    * deployment runs once PER SCHEDULE and is then incremental, rather
    * than replaying history back to `startDateTime`. A long outage is
    * capped at the `maxCatchUp` MOST RECENT missed occurrences PER
    * SCHEDULE (the freshest runs are the ones that matter; a week-dead
    * 5-minute schedule should not replay 2,016 runs) — both the cap
    * and the bootstrap apply before schedules merge, so a
    * high-frequency schedule's backlog can never evict a low-frequency
    * schedule's missed occurrence (a daily job after an outage always
    * catches up, even sharing a ledger with a 5-minute schedule). The
    * drop within one schedule is deliberate and the cap is the
    * caller's knob. */
  def due(schedules: Seq[Schedule], lastFire: Option[Instant],
          now: Instant, maxCatchUp: Int = 100): Seq[Instant] = {
    require(maxCatchUp >= 1, "maxCatchUp must be >= 1")
    lastFire match {
      case Some(last) =>
        schedules.flatMap(_.occurrencesBetween(last, now).takeRight(maxCatchUp))
          .distinct.sorted
      case None =>
        schedules.flatMap(_.lastNotAfter(now)).distinct.sorted
    }
  }

  private val fmt = DateTimeFormatter.ISO_INSTANT

  /** Exact sortable encoding of an instant for the ledger — epoch
    * NANOSECONDS in a long (exact through year 2262). ISO_INSTANT
    * strings are NOT order-safe to compare lexicographically (the
    * formatter emits variable-width fractional seconds, so
    * `…:30Z` > `…:30.5Z` as strings), so the ledger carries this
    * numeric column for the max-fire lookup and keeps the ISO string
    * for humans and as the merge key. */
  private def epochNanos(t: Instant): Long =
    t.getEpochSecond * 1000000000L + t.getNano

  private def fromEpochNanos(n: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(n, 1000000000L),
      Math.floorMod(n, 1000000000L))

  /** Replay-safe catch-up: read the last fired occurrence from the
    * ledger at `ledgerDir` (a [[SnapshotStore]] keyed by `fire_ts`,
    * carrying `fire_epoch` — see [[epochNanos]] — for the
    * chronological max), run `stages(occurrence)` once per due
    * occurrence through [[PipelineRunner.run]] (run id
    * `sched_<epochSecond>`), and MERGE both the ledger rows and the
    * run logs. Returns the union of this tick's run logs (empty ⇒
    * nothing was due). Calling again with the same `now` is a no-op —
    * the ledger advanced — so a host timer may tick as often as it
    * likes; and a failed run is NOT retried by the next tick (its
    * ledger row records `failed`; retry-on-transient belongs to the
    * stage's own `maxAttempts`, re-running a failed BATCH is an
    * operator decision, the reference platform's behavior).
    */
  def runDue(spark: SparkSession, schedules: Seq[Schedule],
             ledgerDir: String, now: Instant, maxCatchUp: Int = 100)
            (stages: Instant => Seq[PipelineStage]): DataFrame = {
    import spark.implicits._
    val last = SnapshotStore.read(spark, ledgerDir).flatMap { led =>
      // ledgers written before the fire_epoch column existed (or whose
      // old rows carry a null after a schema-evolving merge) must keep
      // working: take the chronological max across BOTH encodings —
      // the numeric column where present, and an exact re-parse of the
      // ISO fire_ts strings otherwise. fire_ts strings are not
      // order-safe to max directly (variable-width fractional
      // seconds), so the fallback takes the in-plan max at timestamp
      // precision and exact-parses only the rows in that microsecond
      // (a bounded, normally one-row, collect on a control-plane
      // table).
      val (epochMax, epochAuthoritative): (Option[Instant], Boolean) =
        if (!led.columns.contains("fire_epoch")) (None, false)
        else {
          // one agg job returns both the max and whether any row is
          // missing the numeric encoding (null after a schema-evolving
          // merge) — only then is the ISO re-parse fallback needed
          val ts = led.agg(max(col("fire_epoch")),
            count(lit(1)) - count(col("fire_epoch"))).collect()(0)
          (if (ts.isNullAt(0)) None else Some(fromEpochNanos(ts.getLong(0))),
           !ts.isNullAt(0) && ts.getLong(1) == 0L)
        }
      val isoMax: Option[Instant] = if (epochAuthoritative) None else {
        val withTs = led.withColumn("_fire_parsed", to_timestamp(col("fire_ts")))
        val m = withTs.agg(max(col("_fire_parsed"))).collect()(0)
        if (m.isNullAt(0)) None
        else {
          val cands = withTs.filter(col("_fire_parsed") === lit(m.get(0)))
            .select("fire_ts").as[String].collect().map(Instant.parse)
          Some(cands.maxBy(epochNanos))
        }
      }
      val cand = Seq(epochMax, isoMax).flatten
      if (cand.isEmpty) None else Some(cand.maxBy(epochNanos))
    }
    val occurrences = due(schedules, last, now, maxCatchUp)
    val logs = occurrences.map { t =>
      val runId = s"sched_${t.getEpochSecond}"
      val log = PipelineRunner.run(spark, runId, stages(t)).persist()
      val failed = log.filter(col("status") === "failed").limit(1)
        .count() > 0
      val ledgerRow = Seq((fmt.format(t), epochNanos(t), runId,
        if (failed) "failed" else "succeeded"))
        .toDF("fire_ts", "fire_epoch", "run_id", "status")
      SnapshotStore.mergeInto(ledgerRow, ledgerDir, Seq("fire_ts"))
      log.unpersist()
      log
    }
    logs.reduceOption(_ union _).getOrElse(
      Seq.empty[(String, Int, String, String, Int, Long)]
        .toDF("run_id", "stage_no", "stage", "status", "attempts", "rows"))
  }
}
