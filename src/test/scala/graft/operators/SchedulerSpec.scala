package graft.operators

import java.nio.file.Files
import java.time._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotStore

class SchedulerSpec extends SparkSpec {

  private val NY = ZoneId.of("America/New_York")
  private def i(s: String) = Instant.parse(s)
  private def ld(s: String) = LocalDateTime.parse(s)

  private val daily2am = Schedule(enabled = true, jobType = "Execute",
    Recurrence.Daily(Seq(LocalTime.parse("02:00"))),
    ld("2026-01-01T00:00:00"), ld("2026-12-31T23:59:00"), NY)

  test("daily occurrences carry the zone's live offset (EST vs EDT)") {
    val win = daily2am.occurrencesBetween(
      i("2026-01-14T12:00:00Z"), i("2026-01-15T12:00:00Z"))
    assert(win == Seq(i("2026-01-15T07:00:00Z"))) // 02:00 EST = 07:00Z
    val sum = daily2am.occurrencesBetween(
      i("2026-07-14T12:00:00Z"), i("2026-07-15T12:00:00Z"))
    assert(sum == Seq(i("2026-07-15T06:00:00Z"))) // 02:00 EDT = 06:00Z
  }

  test("DST spring-forward gap resolves forward; fall-back ambiguity to the earlier offset") {
    // 2026-03-08 02:00 America/New_York does not exist -> 03:00 EDT
    val gap = daily2am.occurrencesBetween(
      i("2026-03-08T00:00:00Z"), i("2026-03-09T00:00:00Z"))
    assert(gap == Seq(i("2026-03-08T07:00:00Z")))
    // 2026-11-01 01:30 happens twice -> earlier offset (EDT, 05:30Z)
    val amb = Schedule(enabled = true, jobType = "Execute",
      Recurrence.Daily(Seq(LocalTime.parse("01:30"))),
      ld("2026-11-01T00:00:00"), ld("2026-11-01T23:59:00"), NY)
    assert(amb.occurrencesBetween(i("2026-11-01T00:00:00Z"),
      i("2026-11-02T00:00:00Z")) == Seq(i("2026-11-01T05:30:00Z")))
  }

  test("window semantics: (from, to], schedule bounds inclusive, disabled fires never") {
    val occ = i("2026-01-15T07:00:00Z")
    assert(daily2am.occurrencesBetween(occ, occ.plusSeconds(1)).isEmpty)
    assert(daily2am.occurrencesBetween(occ.minusSeconds(1), occ) == Seq(occ))
    // first/last in-window occurrences fire (start 00:00 <= 02:00 Jan 1;
    // end 23:59 >= 02:00 Dec 31)
    assert(daily2am.occurrencesBetween(i("2025-12-25T00:00:00Z"),
      i("2026-01-01T12:00:00Z")) == Seq(i("2026-01-01T07:00:00Z")))
    assert(daily2am.occurrencesBetween(i("2026-12-31T00:00:00Z"),
      i("2027-03-01T00:00:00Z")) == Seq(i("2026-12-31T07:00:00Z")))
    val off = daily2am.copy(enabled = false)
    assert(off.occurrencesBetween(i("2026-01-01T00:00:00Z"),
      i("2026-02-01T00:00:00Z")).isEmpty)
    assert(off.nextAfter(i("2026-01-01T00:00:00Z")).isEmpty)
    assert(off.lastNotAfter(i("2026-06-01T00:00:00Z")).isEmpty)
  }

  test("weekly fires on the listed weekdays only") {
    val wk = Schedule(enabled = true, jobType = "Execute",
      Recurrence.Weekly(Seq(DayOfWeek.MONDAY, DayOfWeek.FRIDAY),
        Seq(LocalTime.parse("09:30"))),
      ld("2026-01-01T00:00:00"), ld("2026-12-31T23:59:00"),
      ZoneId.of("Europe/London"))
    // week of 2026-01-05 (Mon) .. 2026-01-11 (Sun): Mon 5th + Fri 9th,
    // GMT in January so 09:30 local = 09:30Z
    val occ = wk.occurrencesBetween(
      i("2026-01-04T00:00:00Z"), i("2026-01-11T00:00:00Z"))
    assert(occ == Seq(i("2026-01-05T09:30:00Z"), i("2026-01-09T09:30:00Z")))
    // BST in July: 09:30 local = 08:30Z (Mon 2026-07-06)
    assert(wk.occurrencesBetween(i("2026-07-05T00:00:00Z"),
      i("2026-07-07T00:00:00Z")) == Seq(i("2026-07-06T08:30:00Z")))
  }

  test("interval (Cron) schedules step in physical minutes with arithmetic next/last") {
    val cron = Schedule(enabled = true, jobType = "Execute",
      Recurrence.ByMinutes(15),
      ld("2026-01-01T00:00:00"), ld("2026-01-02T00:00:00"),
      ZoneId.of("UTC"))
    assert(cron.occurrencesBetween(i("2026-01-01T00:07:00Z"),
      i("2026-01-01T00:45:00Z")) == Seq(i("2026-01-01T00:15:00Z"),
      i("2026-01-01T00:30:00Z"), i("2026-01-01T00:45:00Z")))
    // exclusive left at an exact occurrence
    assert(cron.occurrencesBetween(i("2026-01-01T00:15:00Z"),
      i("2026-01-01T00:29:00Z")).isEmpty)
    assert(cron.nextAfter(i("2025-06-01T00:00:00Z"))
      .contains(i("2026-01-01T00:00:00Z"))) // before start -> start fires
    assert(cron.nextAfter(i("2026-01-01T00:15:00Z"))
      .contains(i("2026-01-01T00:30:00Z"))) // strictly after
    assert(cron.nextAfter(i("2026-01-02T00:00:00Z")).isEmpty) // window done
    assert(cron.lastNotAfter(i("2026-01-01T00:14:59Z"))
      .contains(i("2026-01-01T00:00:00Z")))
    assert(cron.lastNotAfter(i("2025-12-31T23:59:59Z")).isEmpty)
    assert(cron.lastNotAfter(i("2026-03-01T00:00:00Z"))
      .contains(i("2026-01-02T00:00:00Z"))) // capped at end
    // a 15-min cadence is 15 physical minutes apart across the
    // spring-forward hour, not re-anchored to local time
    val nyCron = cron.copy(zone = NY, start = ld("2026-03-08T00:00:00"),
      end = ld("2026-03-08T23:59:00"))
    val around = nyCron.occurrencesBetween(
      i("2026-03-08T06:50:00Z"), i("2026-03-08T07:20:00Z"))
    assert(around.size == 2 &&
      Duration.between(around(0), around(1)).toMinutes == 15)
  }

  test("fromJson parses the reference .schedules wire shape and fails fast on junk") {
    // same shape as fabric/claims/orchestration/PLclaims_master
    // .DataPipeline/.schedules (Daily, 02:00, Eastern Standard Time)
    val schedules = Scheduler.fromJson(
      """{"schedules": [
        |  {"enabled": true, "jobType": "Execute", "configuration": {
        |    "type": "Daily", "startDateTime": "2025-09-09T00:00:00",
        |    "endDateTime": "2030-12-31T23:59:00",
        |    "localTimeZoneId": "Eastern Standard Time",
        |    "times": ["02:00"]}},
        |  {"enabled": false, "jobType": "Execute", "configuration": {
        |    "type": "Weekly", "startDateTime": "2025-09-09T00:00:00",
        |    "endDateTime": "2030-12-31T23:59:00",
        |    "localTimeZoneId": "UTC", "times": ["08:00", "16:00"],
        |    "weekdays": ["Monday", "Thursday"]}},
        |  {"enabled": true, "jobType": "Execute", "configuration": {
        |    "type": "Cron", "startDateTime": "2025-09-09T00:00:00",
        |    "endDateTime": "2030-12-31T23:59:00",
        |    "localTimeZoneId": "Asia/Kolkata", "interval": 20}}
        |]}""".stripMargin)
    assert(schedules.size == 3)
    val daily = schedules(0)
    assert(daily.enabled && daily.zone == NY &&
      daily.recurrence == Recurrence.Daily(Seq(LocalTime.parse("02:00"))))
    // 02:00 EST on 2025-12-10 = 07:00Z through the parsed schedule
    assert(daily.occurrencesBetween(i("2025-12-10T00:00:00Z"),
      i("2025-12-11T00:00:00Z")) == Seq(i("2025-12-10T07:00:00Z")))
    assert(!schedules(1).enabled && schedules(1).recurrence ==
      Recurrence.Weekly(Seq(DayOfWeek.MONDAY, DayOfWeek.THURSDAY),
        Seq(LocalTime.parse("08:00"), LocalTime.parse("16:00"))))
    assert(schedules(2).zone == ZoneId.of("Asia/Kolkata") && // IANA pass-through
      schedules(2).recurrence == Recurrence.ByMinutes(20))

    def conf(body: String) =
      s"""{"schedules": [{"enabled": true, "configuration": {$body}}]}"""
    val base = """"startDateTime": "2026-01-01T00:00:00",
      "endDateTime": "2026-12-31T23:59:00", "localTimeZoneId": "UTC""""
    intercept[IllegalArgumentException] { // unknown type
      Scheduler.fromJson(conf(s""""type": "Monthly", $base""")) }
    intercept[IllegalArgumentException] { // Daily without times
      Scheduler.fromJson(conf(s""""type": "Daily", $base""")) }
    intercept[IllegalArgumentException] { // Cron without interval
      Scheduler.fromJson(conf(s""""type": "Cron", $base""")) }
    intercept[IllegalArgumentException] { // unmapped zone
      Scheduler.fromJson(conf(""""type": "Daily", "times": ["02:00"],
        "startDateTime": "2026-01-01T00:00:00",
        "endDateTime": "2026-12-31T23:59:00",
        "localTimeZoneId": "Middle Earth Standard Time"""")) }
  }

  test("due: catch-up window, most-recent cap, single-occurrence bootstrap") {
    val utcDaily = daily2am.copy(zone = ZoneId.of("UTC"))
    // catch-up after 3 missed days
    assert(Scheduler.due(Seq(utcDaily), Some(i("2026-02-01T03:00:00Z")),
      i("2026-02-04T03:00:00Z")) == Seq(i("2026-02-02T02:00:00Z"),
      i("2026-02-03T02:00:00Z"), i("2026-02-04T02:00:00Z")))
    // cap keeps the MOST RECENT occurrences
    assert(Scheduler.due(Seq(utcDaily), Some(i("2026-02-01T03:00:00Z")),
      i("2026-02-04T03:00:00Z"), maxCatchUp = 2) ==
      Seq(i("2026-02-03T02:00:00Z"), i("2026-02-04T02:00:00Z")))
    // no ledger -> exactly the latest occurrence <= now
    assert(Scheduler.due(Seq(utcDaily), None, i("2026-02-04T03:00:00Z")) ==
      Seq(i("2026-02-04T02:00:00Z")))
    // two schedules landing on one instant de-dup to one unit of work
    assert(Scheduler.due(Seq(utcDaily, utcDaily.copy(jobType = "Other")),
      Some(i("2026-02-03T03:00:00Z")), i("2026-02-04T03:00:00Z")) ==
      Seq(i("2026-02-04T02:00:00Z")))
  }

  test("runDue: one run per occurrence, replay-safe ledger, failures not re-fired") {
    val dir = Files.createTempDirectory("graft-sched").toString
    val utcDaily = daily2am.copy(zone = ZoneId.of("UTC"))
    var fired = Vector.empty[Instant]
    def stages(t: Instant) = Seq(
      PipelineStage("work")(() => { fired :+= t; 1L }))

    // cold start bootstraps exactly one run (the latest occurrence)
    val log1 = Scheduler.runDue(spark, Seq(utcDaily), dir,
      i("2026-02-01T03:00:00Z"))(stages)
    assert(fired == Vector(i("2026-02-01T02:00:00Z")))
    assert(log1.select("run_id", "status").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq ==
      Seq(("sched_1769911200", "succeeded")))

    // same tick again: ledger advanced, nothing due
    assert(Scheduler.runDue(spark, Seq(utcDaily), dir,
      i("2026-02-01T03:00:00Z"))(stages).count() == 0 && fired.size == 1)

    // two days later: both missed occurrences run, in order
    Scheduler.runDue(spark, Seq(utcDaily), dir,
      i("2026-02-03T03:00:00Z"))(stages)
    assert(fired.drop(1) == Vector(i("2026-02-02T02:00:00Z"),
      i("2026-02-03T02:00:00Z")))

    // a failed occurrence lands in the ledger as failed and is NOT
    // re-fired by the next tick (stage-level retry is maxAttempts'
    // job; re-running a failed batch is an operator decision)
    var attempts = 0
    Scheduler.runDue(spark, Seq(utcDaily), dir, i("2026-02-04T03:00:00Z")) {
      _ => Seq(PipelineStage("boom", maxAttempts = 1)(() => {
        attempts += 1; sys.error("kaput") }))
    }
    assert(attempts == 1)
    Scheduler.runDue(spark, Seq(utcDaily), dir,
      i("2026-02-04T04:00:00Z"))(stages)
    assert(fired.size == 3) // the failed 02-04 occurrence stayed consumed
    val ledger = SnapshotStore.read(spark, dir).get
      .orderBy("fire_epoch").select("status").collect()
    assert(ledger.map(_.getString(0)).toSeq ==
      Seq("succeeded", "succeeded", "succeeded", "failed"))
  }

  test("due: cap and bootstrap apply PER SCHEDULE — no cross-schedule starvation") {
    val utc = ZoneId.of("UTC")
    val utcDaily = daily2am.copy(zone = utc)
    val cron5 = Schedule(enabled = true, jobType = "Execute",
      Recurrence.ByMinutes(5),
      ld("2026-01-01T00:00:00"), ld("2026-12-31T23:59:00"), utc)
    // 3-day outage: the 5-min schedule missed ~860 occurrences, the
    // daily one missed 3 — a shared cap of 10 must still catch up ALL
    // THREE daily occurrences (the old global takeRight evicted them)
    val due = Scheduler.due(Seq(utcDaily, cron5),
      Some(i("2026-02-01T03:00:00Z")), i("2026-02-04T03:00:00Z"),
      maxCatchUp = 10)
    Seq("2026-02-02T02:00:00Z", "2026-02-03T02:00:00Z",
        "2026-02-04T02:00:00Z").foreach(t =>
      assert(due.contains(i(t)), s"daily occurrence $t starved out"))
    // the cron side is capped at ITS OWN 10 most recent (02:15..03:00,
    // disjoint from the daily instants) -> 13 total
    assert(due.size == 13 && due == due.sorted)
    // bootstrap (no ledger): each schedule's own latest occurrence —
    // the daily job is not skipped just because the cron fired later
    val boot = Scheduler.due(Seq(utcDaily, cron5), None,
      i("2026-02-04T02:07:00Z"))
    assert(boot == Seq(i("2026-02-04T02:00:00Z"), i("2026-02-04T02:05:00Z")))
  }

  test("runDue: a pre-fire_epoch ledger keeps working (no re-fire, no crash)") {
    // ledgers written before the numeric fire_epoch column existed
    // carry (fire_ts, run_id, status) only — the upgraded runDue must
    // read their chronological max from the ISO strings instead of
    // throwing on the missing column, and must NOT re-fire the
    // recorded occurrence (a cold-start bootstrap here replays work)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sched-legacy").toString
    val utcDaily = daily2am.copy(zone = ZoneId.of("UTC"))
    SnapshotStore.mergeInto(
      Seq(("2026-02-01T02:00:00Z", "sched_1769911200", "succeeded"))
        .toDF("fire_ts", "run_id", "status"),
      dir, Seq("fire_ts"))
    var fired = Vector.empty[Instant]
    def stages(t: Instant) = Seq(
      PipelineStage("work")(() => { fired :+= t; 1L }))
    // same tick as the legacy fire: nothing due
    assert(Scheduler.runDue(spark, Seq(utcDaily), dir,
      i("2026-02-01T03:00:00Z"))(stages).count() == 0 && fired.isEmpty)
    // next day: exactly the one new occurrence fires, and the merged
    // ledger (legacy row now null fire_epoch) still reads correctly
    Scheduler.runDue(spark, Seq(utcDaily), dir,
      i("2026-02-02T03:00:00Z"))(stages)
    assert(fired == Vector(i("2026-02-02T02:00:00Z")))
    assert(Scheduler.runDue(spark, Seq(utcDaily), dir,
      i("2026-02-02T03:00:00Z"))(stages).count() == 0 && fired.size == 1)
  }

  test("runDue: sub-second fire times do not break the replay-safe ledger") {
    // ISO_INSTANT emits variable-width fractional seconds, so the
    // lexicographic max is WRONG across mixed precision ('…:00Z' >
    // '…:00.500Z' as strings): the ledger's numeric fire_epoch must
    // carry the chronological max instead, or the fractional
    // occurrence re-fires every tick
    val dir = Files.createTempDirectory("graft-sched-frac").toString
    val utc = ZoneId.of("UTC")
    val whole = daily2am.copy(zone = utc)  // 02:00:00 exactly
    val frac = Schedule(enabled = true, jobType = "Execute",
      Recurrence.Daily(Seq(LocalTime.parse("02:05:00.500"))),
      ld("2026-01-01T00:00:00"), ld("2026-12-31T23:59:00"), utc)
    var fired = Vector.empty[Instant]
    def stages(t: Instant) = Seq(
      PipelineStage("work")(() => { fired :+= t; 1L }))
    // bootstrap fires both: 02:00:00Z (whole) and 02:05:00.5Z (frac)
    Scheduler.runDue(spark, Seq(whole, frac), dir,
      i("2026-02-01T02:06:00Z"))(stages)
    assert(fired == Vector(i("2026-02-01T02:00:00Z"),
      i("2026-02-01T02:05:00.500Z")))
    // same tick again: nothing due — with the lexicographic max the
    // window would re-open at 02:00:00 and re-fire the .5s occurrence
    assert(Scheduler.runDue(spark, Seq(whole, frac), dir,
      i("2026-02-01T02:06:00Z"))(stages).count() == 0)
    assert(fired.size == 2, s"occurrence re-fired: $fired")
  }
}
