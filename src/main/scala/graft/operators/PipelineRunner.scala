package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Orchestration-chain runner — the library-side analog of the
  * reference's master pipeline (fabric/claims/PLclaims_master
  * .DataPipeline: ordered activities, per-activity retry policy, run
  * history), for the part of that machinery that belongs IN a library
  * rather than a platform: ordered stages, bounded per-stage retry,
  * failure isolation (downstream stages of a failed stage are skipped,
  * independent chains keep running via separate `run` calls), and a
  * deterministic run log a caller can persist through
  * [[graft.sources.SnapshotStore.mergeInto]] keyed (run_id, stage) —
  * the reference's IngestionLogs pattern. Scheduling/triggers stay
  * platform territory (SURVEY §2's declared boundary): cron, Airflow,
  * or Databricks Jobs invoke `run`; nothing here sleeps or polls.
  *
  * Stages run SEQUENTIALLY on the driver (each stage's Spark jobs are
  * the parallel part — the runner is control plane, like
  * [[graft.Medallion.run]]'s fixed chain, which this generalizes).
  * The run log is deterministic by construction (attempt counts and
  * row counts, no wall-clock columns), so specs — and any two engines
  * replaying the same stages — agree bit for bit.
  *
  * @param name        stage name (the log key)
  * @param maxAttempts total tries before the stage is declared failed
  *                    (>= 1; transient-failure retry is the reference
  *                    pipeline's per-activity retry policy)
  * @param run         the stage body; returns the rows affected
  *                    (logged). Throwing marks the attempt failed.
  */
final case class PipelineStage(name: String, maxAttempts: Int = 2)
                              (val run: () => Long) {
  require(maxAttempts >= 1, s"stage $name: maxAttempts must be >= 1")
}

object PipelineRunner {

  /** Run `stages` in order with per-stage retry; returns the run log:
    * one row per stage — (run_id, stage_no, stage, status, attempts,
    * rows) with status `succeeded` / `failed` / `skipped`. The first
    * stage that exhausts its attempts fails the run: every later
    * stage logs `skipped` with 0 attempts (a medallion chain must not
    * publish gold over a failed silver). The runner never throws on
    * stage failure — the log IS the outcome; `require`-style misuse
    * (empty stage list, duplicate names) still throws. */
  def run(spark: SparkSession, runId: String,
          stages: Seq[PipelineStage]): DataFrame = {
    require(stages.nonEmpty, "no stages")
    require(stages.map(_.name).distinct.size == stages.size,
      s"duplicate stage names: ${stages.map(_.name)}")
    var failed = false
    val log = stages.zipWithIndex.map { case (st, i) =>
      if (failed) (runId, i, st.name, "skipped", 0, 0L)
      else {
        var attempt = 0
        var rows = 0L
        var ok = false
        while (!ok && attempt < st.maxAttempts) {
          attempt += 1
          try { rows = st.run(); ok = true }
          catch { case scala.util.control.NonFatal(_) => }
        }
        if (!ok) failed = true
        (runId, i, st.name, if (ok) "succeeded" else "failed", attempt,
          if (ok) rows else 0L)
      }
    }
    import spark.implicits._
    log.toDF("run_id", "stage_no", "stage", "status", "attempts", "rows")
  }
}
