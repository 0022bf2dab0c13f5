package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Merge

/** Versioned parquet snapshot store with an atomically-swapped current
  * pointer — the minimal MERGE-capable table format when a
  * transactional lake format isn't available.
  *
  * Layout: `<dir>/v=<N>/part-*.parquet` plus `<dir>/_CURRENT`
  * containing N. Readers resolve `_CURRENT` then read only that
  * version, so a concurrent merge (which writes v=N+1 fully before
  * moving the pointer) never disturbs them; the pointer move is a
  * same-directory atomic rename. Old versions are retained (time
  * travel / audit, like the reference keeps IngestionLogs history).
  *
  * Mirrors the reference's Delta MERGE loop
  * (fabric/claims/bronze/NBclaims_bronze.Notebook/notebook-content.py:215-227)
  * over plain parquet.
  */
object SnapshotStore {

  private def pointer(dir: String) = Paths.get(dir, "_CURRENT")

  def currentVersion(dir: String): Option[Int] = {
    val p = pointer(dir)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  /** The current snapshot, if any version has been committed. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    currentVersion(dir).map(v => spark.read.parquet(s"$dir/v=$v"))

  /** Time-travel read of a retained `version` — the `versionAsOf`
    * analog of the Delta tables this store stands in for (debugging a
    * bad MERGE batch in the nightly loop means diffing v against v-1).
    * None if the version was never committed, is ahead of the current
    * pointer (a concurrent writer may have its data files down but the
    * commit not yet published), or has been pruned by [[compact]]'s
    * retention window. */
  def readVersion(spark: SparkSession, dir: String, version: Int): Option[DataFrame] =
    currentVersion(dir) match {
      case Some(cur) if version >= 0 && version <= cur &&
          Files.isDirectory(Paths.get(dir, s"v=$version")) =>
        Some(spark.read.parquet(s"$dir/v=$version"))
      case _ => None
    }

  /** Write `df` as the next version and atomically move the pointer. */
  def commit(df: DataFrame, dir: String): Int = {
    val next = currentVersion(dir).getOrElse(-1) + 1
    df.write.mode("overwrite").parquet(s"$dir/v=$next")
    val tmp = Paths.get(dir, "_CURRENT.tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** MERGE a batch into the store: whenMatchedUpdateAll /
    * whenNotMatchedInsertAll keyed on `keys` (see [[Merge.upsert]]);
    * first batch bootstraps the table.
    *
    * Schema evolution is ON by default, matching the Delta MERGE this
    * store stands in for: a batch that gains (or drops) a column
    * merges fine — the union of both schemas survives, NULL where a
    * side lacked the column. A long-running nightly loop must not die
    * the first time upstream adds a field. Pass
    * `evolveSchema = false` to fail fast on any schema drift instead. */
  def mergeInto(batch: DataFrame, dir: String, keys: Seq[String],
                evolveSchema: Boolean = true): Int = {
    val merged = read(batch.sparkSession, dir) match {
      case Some(target) => Merge.upsert(target, batch, keys, evolveSchema)
      case None => batch
    }
    commit(merged, dir)
  }

  /** `DELETE FROM <store> WHERE cond` — the Delta DELETE this store
    * stands in for (the GDPR-erasure / tombstone primitive at the
    * snapshot level, next to the persisted indexes' delete legs):
    * surviving rows re-commit as the next version, so time travel
    * still reads the pre-delete state at the prior version and
    * [[changes]] reports the deletions as a change feed. SQL DELETE
    * three-valued logic: a row is removed only where `cond` is
    * definitively TRUE — rows where it evaluates NULL survive, the
    * same no-op treatment [[updateWhere]]'s `when` gives them (a bare
    * `filter(!cond)` would silently erase them). Returns the
    * new version, or None when the store doesn't exist yet. */
  def deleteWhere(spark: SparkSession, dir: String,
                  cond: org.apache.spark.sql.Column): Option[Int] = {
    import org.apache.spark.sql.functions.{lit, not}
    read(spark, dir).map(t => commit(t.filter(not(cond <=> lit(true))), dir))
  }

  /** `UPDATE <store> SET col = expr WHERE cond` — Delta UPDATE:
    * `assignments` apply only where `cond` holds, every other row
    * passes through unchanged. One map-only pass + commit; the same
    * versioning/time-travel/CDF guarantees as [[deleteWhere]].
    * Assigned columns must already exist (UPDATE, not evolution).
    * Returns the new version, or None when the store doesn't exist. */
  def updateWhere(spark: SparkSession, dir: String,
                  cond: org.apache.spark.sql.Column,
                  assignments: Map[String, org.apache.spark.sql.Column])
      : Option[Int] = {
    import org.apache.spark.sql.functions.{col, when}
    read(spark, dir).map { t =>
      val missing = assignments.keySet -- t.columns.toSet
      require(missing.isEmpty, s"unknown columns in UPDATE: $missing")
      // ONE select so every assignment (and cond) reads the ORIGINAL
      // row — SQL UPDATE semantics; chained withColumns would leak one
      // assignment's result into the next
      commit(t.select(t.columns.toIndexedSeq.map { c =>
        assignments.get(c) match {
          case Some(expr) => when(cond, expr).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*), dir)
    }
  }

  /** MERGE that fully REPLACES each touched group: target rows whose
    * `groupKeys` value appears in the delete-key set are deleted, then
    * the batch's rows insert. The shape a "result set per key" sink
    * needs (e.g. top-k hits keyed (query_id, rank)): a re-submitted
    * group may SHRINK, and a plain upsert on the full row key would
    * leave the old tail ranks lingering past the new result size. One
    * left_anti on the (broadcast-sized) distinct group keys + the same
    * commit protocol as [[mergeInto]]; replay-safe for the same reason
    * (replacing a group with itself is idempotent).
    *
    * `keySource` (default: the batch itself) supplies the groups to
    * delete. Pass the REQUEST frame when a group's new result set may
    * legitimately be EMPTY — keys derived from the result rows alone
    * can never delete a group whose re-computation returned zero rows,
    * so its stale rows would linger indefinitely. */
  def replaceGroups(batch: DataFrame, dir: String, groupKeys: Seq[String],
                    keySource: Option[DataFrame] = None): Int = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val delKeys = keySource.getOrElse(batch)
      .select(groupKeys.map(col): _*).distinct()
    val merged = read(batch.sparkSession, dir) match {
      case Some(target) =>
        target.join(broadcast(delKeys), groupKeys, "left_anti")
          .unionByName(batch, allowMissingColumns = true)
      case None => batch
    }
    commit(merged, dir)
  }

  /** Change feed between two retained versions — the change-data-feed
    * analog of the Delta tables this store stands in for: one row per
    * key whose content differs between `fromV` and `toV`, tagged
    * `change_type` insert / update_postimage / delete, with `toV`'s
    * columns (the preimage is a [[readVersion]] away). The downstream
    * contract every incremental consumer (sync jobs, audit diffs,
    * cache invalidation) builds on.
    *
    * One keyed full-outer join of the two snapshots — same shuffle
    * shape as the MERGE that produced them; non-key columns compare
    * null-safely via a struct equality (schema evolution: columns
    * missing on one side read as NULL there, so a gained column marks
    * rows as updates only where it is non-null). None if either
    * version is unreadable (never committed, ahead of the pointer, or
    * pruned by [[compact]]). */
  def changes(spark: SparkSession, dir: String, fromV: Int, toV: Int,
              keys: Seq[String]): Option[DataFrame] =
    (readVersion(spark, dir, fromV), readVersion(spark, dir, toV)) match {
      case (Some(before), Some(after)) =>
        import org.apache.spark.sql.functions._
        val cols = (before.columns ++ after.columns).distinct
          .filterNot(keys.contains)
        def content(df: DataFrame) = struct(cols.map(c =>
          if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)
        val b = before.select(keys.map(col) :+
          content(before).as("__b") :+ lit(1).as("__in_b"): _*)
        val a = after.select(keys.map(col) ++
          after.columns.filterNot(keys.contains).map(col) :+
          content(after).as("__a") :+ lit(1).as("__in_a"): _*)
        Some(b.join(a, keys, "full_outer")
          .withColumn("change_type",
            when(col("__in_b").isNull, lit("insert"))
              .when(col("__in_a").isNull, lit("delete"))
              .when(not(col("__a") <=> col("__b")), lit("update_postimage")))
          .filter(col("change_type").isNotNull)
          .drop("__a", "__b", "__in_a", "__in_b"))
      case _ => None
    }

  /** Atomic ONE-SHOT claim — the compare-and-set primitive this store
    * otherwise lacks (r16 verdict #6): exactly one concurrent caller
    * of `tryClaim(dir, token, …)` ever returns true, and the winning
    * call's `payload` is readable by everyone via [[claimPayload]]
    * from that moment on. A claim is permanent (at-most-once is the
    * point — there is deliberately no release; stale-claim recovery
    * is an operator action, visible as the `_claim_<token>` file).
    *
    * Mechanism: the payload is written fully to a private temp file,
    * then PUBLISHED by `Files.createLink(claim, tmp)` — hard-link
    * creation is atomic and fails with FileAlreadyExistsException
    * when the target exists (the classic lockfile technique; atomic
    * rename can't be used here because POSIX rename REPLACES an
    * existing target). Readers therefore never observe a
    * partially-written payload: the link appears only after the temp
    * file's content is complete. The guarantee is exactly as strong
    * as the filesystem's link atomicity — true on local FS and HDFS,
    * i.e. everywhere this java.nio-backed store runs at all; a
    * future object-store port must swap in that store's conditional
    * put, the same caveat the `_CURRENT` pointer swap already
    * carries.
    *
    * `token` must be filesystem-safe (`[A-Za-z0-9._-]+`) — callers
    * with arbitrary identifiers hex-encode them first. */
  def tryClaim(dir: String, token: String, payload: String): Boolean = {
    require(token.matches("[A-Za-z0-9._-]+"),
      s"claim token must be filesystem-safe: '$token'")
    Files.createDirectories(Paths.get(dir))
    val claim = Paths.get(dir, s"_claim_$token")
    if (Files.exists(claim)) return false
    val tmp = Paths.get(dir, s"_claim_$token.tmp." +
      ProcessHandle.current().pid() + "." + Thread.currentThread().getId)
    Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
    try { Files.createLink(claim, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally { Files.deleteIfExists(tmp); () }
  }

  /** The winning [[tryClaim]] payload for `token`, if any claim has
    * been published. */
  def claimPayload(dir: String, token: String): Option[String] = {
    val claim = Paths.get(dir, s"_claim_$token")
    if (Files.exists(claim))
      Some(new String(Files.readAllBytes(claim), StandardCharsets.UTF_8))
    else None
  }

  /** Compact the current snapshot into `numFiles` files and drop
    * versions older than `retain` behind the new pointer — the
    * maintenance pass every MERGE-loop table needs: each micro-batch
    * commit writes shuffle-partition-many files, and a long-running
    * sink otherwise accumulates both small files (scan overhead: one
    * task + one footer read each) and dead versions (unbounded disk).
    * Readers are never disturbed: the compacted copy commits through
    * the same write-fully-then-swap pointer protocol, and only
    * versions strictly behind the retained window are deleted
    * (`retain >= 1`, so the version a reader could have just resolved
    * survives at least one compaction). WRITERS are single-writer by
    * contract, like every log-less table format: run compact from the
    * same maintenance loop as the merges — a compact racing a
    * concurrent mergeInto can both claim the same next version.
    * Returns the new current version, or None for an empty store. */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 1,
              retain: Int = 1): Option[Int] = {
    require(numFiles > 0 && retain >= 1, "numFiles > 0, retain >= 1")
    read(spark, dir).map { cur =>
      val v = commit(cur.coalesce(numFiles), dir)
      val cutoff = v - retain
      val entries = Files.list(Paths.get(dir))
      try entries.forEach { p =>
        val name = p.getFileName.toString
        if (name.matches("v=\\d+") && name.drop(2).toInt < cutoff) {
          val files = Files.walk(p)
          try files.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => Files.delete(f))
          finally files.close()
        }
      } finally entries.close()
      v
    }
  }
}
