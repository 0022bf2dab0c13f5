package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Persisted IVF-PQ index — build once, probe every batch, update
  * incrementally. The ANN analogue of the dedup family's persisted
  * band index ([[graft.dedup.TextDedup.writeDedupIndexBucketed]]),
  * sharing its metastore protocol: data lands in versioned tables,
  * a single `CREATE OR REPLACE VIEW` is the atomic current pointer,
  * single-writer, one prior version retained for in-flight readers.
  *
  * Atomicity: the ONE `<name>_ptr` view (a literal `SELECT v`) is the
  * only pointer; [[topK]] and [[update]] resolve it once and then read
  * the five `_<t>_v$v` tables of that pinned version directly, so a
  * reader planned mid-commit sees a complete version — never a new
  * codebook with old codes. (Per-table `<name>_<t>` views also exist
  * as a convenience for ad-hoc SQL, but they are repointed
  * sequentially and carry no consistency guarantee; anything that
  * joins across index tables must pin through the ptr as [[topK]]
  * does.)
  *
  * [[Pq.ivfPqTopK]] re-derives quantizers and re-encodes the corpus on
  * every call — right for one-shot jobs, wrong for a nightly search
  * service over a 100 TB corpus. Here the expensive corpus-wide passes
  * happen once at [[write]] and O(batch) at [[update]]; [[topK]] reads
  * five tables and touches nothing corpus-sized except bucketed scans:
  *
  *  - `<name>_cents`    (cent_id, cent, centn)  — tiny, broadcast
  *  - `<name>_codebook` (j, code_id, cw, cc)    — tiny, broadcast
  *  - `<name>_assign`   (neighbor_id, cent_id)  — bucketed by cent_id:
  *    the candidate join reads it pre-partitioned
  *  - `<name>_codes`    (neighbor_id, j, code)  — bucketed by
  *    neighbor_id: the ADC scoring join reads it pre-partitioned
  *  - `<name>_vectors`  (neighbor_id, emb float[], cn) — bucketed by
  *    neighbor_id: the exact re-rank fetches only |Q| x shortlist
  *    rows. Stored as the source floats (half the bytes of the
  *    double-cast working form; the cast back is exact)
  *  - `<name>_meta`     (neighbor_id, metadata…) — OPTIONAL, written
  *    via [[write]]'s `metaCols`, bucketed by neighbor_id, kept
  *    current through [[update]]/[[delete]]; [[topKFiltered]]'s
  *    admission join. Indexes without it are unchanged.
  *
  * [[update]] encodes an incoming batch with the STORED quantizers
  * (map-only over the batch) and upserts — the index stays coherent
  * under the frozen-quantizer contract every production IVF-PQ system
  * uses between full retrains (re-[[write]] to retrain).
  *
  * Probing an index written with [[write]]'s defaults returns exactly
  * [[Pq.ivfPqTopK]]'s output for the same corpus (spec-asserted):
  * persistence changes where the stages run, not what they compute.
  */
object AnnIndex {

  import graft.sources.BucketedStore

  private val IndexTables =
    Seq("cents", "codebook", "assign", "codes", "vectors", "meta")

  /** The committed current version (see [[BucketedStore.currentVersion]]). */
  def currentVersion(spark: SparkSession, name: String): Option[Int] =
    BucketedStore.currentVersion(spark, name)

  /** Drop every catalog object and on-disk remnant of index `name`
    * (see [[BucketedStore.drop]]). Shared by the shipped e6 entries
    * and the specs so the cleanup path can't drift. */
  def drop(spark: SparkSession, name: String): Unit =
    BucketedStore.drop(spark, name, IndexTables)

  private def centSim(e: Column, n: Column): Column =
    Vectors.qcos(e, col("cent"), n * col("centn"))

  /** Nearest stored centroid per vector of `c` — same argmax (csim
    * desc, cent_id asc) as [[Pq]]'s assignment. */
  private def assign(c: DataFrame, cents: DataFrame): DataFrame =
    c.join(cents)
      .withColumn("csim", centSim(col("ce"), col("cn")))
      .groupBy("neighbor_id")
      .agg(max_by(col("cent_id"),
        struct(col("csim"), (-col("cent_id")).as("nid"))).as("cent_id"))

  /** PQ codes of `c` under a stored codebook. Subspace geometry comes
    * from the codebook rows themselves (`j`, `size(cw)`), so no m/dim
    * scalars are needed — an index probe can't drift from its build. */
  private def encode(c: DataFrame, cb: DataFrame): DataFrame =
    c.join(cb)
      .withColumn("xs",
        slice(col("ce"), col("j") * size(col("cw")) + 1, size(col("cw"))))
      // §6 quantizer (Quantize scaladoc): d2 feeds the code argmin,
      // so the 6-dp cut must be engine-identical at the half boundary
      .withColumn("d2", graft.functions.Quantize.qdp(
        Vectors.dot(col("xs"), col("xs"))
          - lit(2) * Vectors.dot(col("xs"), col("cw")) + col("cc"), 6))
      .groupBy("neighbor_id", "j")
      .agg(min_by(col("code_id"), struct(col("d2"), col("code_id"))).as("code"))

  /** Commit one index version through the shared store protocol:
    * cents/codebook are tiny broadcast-side tables; assign buckets on
    * the candidate join's key, codes and vectors on the ADC/re-rank
    * join's key, so a probe plans no exchange on any corpus-sized
    * input. The store's single ptr view makes the five-table commit
    * atomic for readers. */
  /** `carry` names members whose content is UNCHANGED from that
    * version ([[graft.sources.BucketedStore.Carry]]): they publish as
    * version-pinned views instead of being rewritten, and any
    * DataFrame passed for them here is ignored — the maintenance legs
    * (update/delete: cents+codebook frozen; retrain: vectors
    * untouched) only pay for the members they actually change. */
  private def commit(spark: SparkSession, name: String,
                     cents: DataFrame, cb: DataFrame, asg: DataFrame,
                     codes: DataFrame, vectors: DataFrame, buckets: Int,
                     meta: Option[DataFrame] = None,
                     carry: Seq[BucketedStore.Carry] = Nil): Int = {
    val carried = carry.map(_.suffix).toSet
    BucketedStore.commit(spark, name,
      (Seq(
        BucketedStore.Member("cents", cents),
        BucketedStore.Member("codebook", cb),
        BucketedStore.Member("assign", asg, Seq("cent_id")),
        BucketedStore.Member("codes", codes, Seq("neighbor_id")),
        BucketedStore.Member("vectors", vectors, Seq("neighbor_id"))) ++
        meta.map(m => BucketedStore.Member("meta", m, Seq("neighbor_id"))))
        .filterNot(m => carried(m.suffix)),
      buckets, carry)
  }

  /** Whether version `v` of index `name` carries the optional metadata
    * member (written by [[write]]'s `metaCols`). */
  private def hasMeta(spark: SparkSession, name: String, v: Int): Boolean =
    spark.catalog.tableExists(s"${name}_meta_v$v")

  private def metaOf(df: DataFrame, metaCols: Seq[String]): DataFrame =
    df.select((col("vec_id").as("neighbor_id") +: metaCols.map(col)): _*)

  /** The [[Pq]]-rule deterministic codebook sample over a prepped
    * corpus: the first `nCodes` ids under hash order, each split into
    * `m` subvectors of length `sub`. Shared by [[write]] and
    * [[retrain]] so a retrain's codebook can't drift from the build
    * rule. */
  private def sampleCodebook(c: DataFrame, nCodes: Int, m: Int,
                             sub: Int): DataFrame =
    c.orderBy(Pq.sampleOrd: _*).limit(nCodes)
      .select(col("neighbor_id").as("code_id"),
        explode(transform(sequence(lit(0), lit(m - 1)),
          j => struct(j.as("j"),
            slice(col("ce"), j * sub + 1, lit(sub)).as("sv")))).as("s"))
      .select(col("s.j").as("j"), col("code_id"), col("s.sv").as("cw"))
      .withColumn("cc", Vectors.dot(col("cw"), col("cw")))

  /** Build and commit a full index over `corpus` (vec_id, embedding);
    * returns the committed version. Quantizers default to [[Pq]]'s
    * deterministic hash-order samples; pass `centroids` =
    * [[KMeans.lloyd]]'s (cent_id, dim, value) output for a TRAINED
    * coarse quantizer (the e3b/e5b production shape — `nCentroids` is
    * then ignored). [[retrain]] produces exactly this trained build
    * in place. */
  def write(corpus: DataFrame, name: String,
            nCentroids: Int = 16, m: Int = 4, nCodes: Int = 16,
            dim: Int = 64, buckets: Int = 32,
            metaCols: Seq[String] = Nil,
            centroids: Option[DataFrame] = None): Int = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val spark = corpus.sparkSession
    val sub = dim / m
    val c = Pq.prep(corpus)
    val cents = centroids match {
      case Some(tr) => Knn.assembleCentroids(tr)
      case None => c.orderBy(Pq.sampleOrd: _*).limit(nCentroids)
        .select(col("neighbor_id").as("cent_id"), col("ce").as("cent"),
          col("cn").as("centn"))
    }
    val cb = sampleCodebook(c, nCodes, m, sub)
    val bCents = broadcast(cents)
    val bCb = broadcast(cb)
    commit(spark, name, cents, cb,
      assign(c, bCents), encode(c, bCb), storedVectors(corpus), buckets,
      if (metaCols.isEmpty) None else Some(metaOf(corpus, metaCols)))
  }

  /** The float-typed persisted form of the re-rank table: source
    * embedding + precomputed norm (norm math happens in double, so the
    * stored cn equals the working form's). */
  private def storedVectors(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .withColumn("cn", Vectors.norm(Vectors.asDouble(col("embedding"))))

  /** Encode an incoming batch with the STORED quantizers and upsert it
    * (keyed on neighbor_id) — O(batch) compute, one index rewrite
    * pass. Returns the new version. */
  def update(incoming: DataFrame, name: String, buckets: Int = 32): Int = {
    val spark = incoming.sparkSession
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no ANN index named $name"))
    val cents = broadcast(spark.table(s"${name}_cents_v$v"))
    val cb = broadcast(spark.table(s"${name}_codebook_v$v"))
    val inc = Pq.prep(incoming)
    import graft.operators.Merge
    // an index written with metaCols keeps its metadata current: the
    // incoming batch must carry the same columns (fail-fast select)
    val meta =
      if (!hasMeta(spark, name, v)) None
      else {
        val stored = spark.table(s"${name}_meta_v$v")
        Some(Merge.upsert(stored,
          metaOf(incoming, stored.columns.filter(_ != "neighbor_id").toIndexedSeq),
          Seq("neighbor_id")))
      }
    commit(spark, name,
      spark.table(s"${name}_cents_v$v"), spark.table(s"${name}_codebook_v$v"),
      Merge.upsert(spark.table(s"${name}_assign_v$v"), assign(inc, cents),
        Seq("neighbor_id")),
      Merge.upsert(spark.table(s"${name}_codes_v$v"), encode(inc, cb),
        Seq("neighbor_id", "j")),
      Merge.upsert(spark.table(s"${name}_vectors_v$v"), storedVectors(incoming),
        Seq("neighbor_id")),
      buckets, meta,
      // frozen-quantizer contract: cents/codebook are untouched — carry
      carry = Seq(BucketedStore.Carry("cents", v),
        BucketedStore.Carry("codebook", v)))
  }

  /** Remove a vector id set from index `name` — the takedown /
    * tombstone leg next to [[update]], under the same frozen-quantizer
    * contract: cents/codebook pass through untouched (retraining is a
    * separate cadence), and the deleted ids leave `assign`, `codes`,
    * and `vectors` by one anti-join each — so a probe after delete
    * equals a probe of an index whose corpus never contained them
    * (spec-asserted). Ids absent from the index are no-ops. `ids`'
    * first column is the vector id; a delete set is
    * takedown-request-sized — broadcast. Returns the new version. */
  def delete(ids: DataFrame, name: String, buckets: Int = 32): Int = {
    val spark = ids.sparkSession
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no ANN index named $name"))
    val del = broadcast(
      ids.select(col(ids.columns.head).as("neighbor_id")).distinct())
    def anti(t: String) = spark.table(s"${name}_${t}_v$v")
      .join(del, Seq("neighbor_id"), "left_anti")
    commit(spark, name,
      spark.table(s"${name}_cents_v$v"), spark.table(s"${name}_codebook_v$v"),
      anti("assign"), anti("codes"), anti("vectors"), buckets,
      if (hasMeta(spark, name, v)) Some(anti("meta")) else None,
      // frozen-quantizer contract: cents/codebook are untouched — carry
      carry = Seq(BucketedStore.Carry("cents", v),
        BucketedStore.Carry("codebook", v)))
  }

  /** Retrain the index's quantizers IN PLACE — the operator that ACTS
    * on the [[stats]]/[[fit]] retrain signal (skewed occupancy, decayed
    * mean fit): re-fit the coarse quantizer with [[KMeans.lloyd]] over
    * the STORED vectors member, re-derive the codebook by the same
    * hash-order sample rule [[write]] uses over the CURRENT corpus
    * (an index built before many updates re-samples codewords from
    * what it actually holds now), re-assign and re-encode every stored
    * vector under the new quantizers, and commit as version v+1 behind
    * the atomic ptr — in-flight probes pinned to v are never torn, the
    * protocol [[topK]] already guarantees. The metadata member passes
    * through untouched.
    *
    * Probe-after-retrain equals a probe of a FRESH [[write]] with
    * `centroids = Some(KMeans.lloyd(storedCorpus, k, iters))` over the
    * stored corpus (spec-asserted) — retrain changes WHERE the
    * quantizers come from, not what a trained index computes. Subspace
    * geometry (m, codewords-per-subspace, subvector length) comes from
    * the stored codebook, so a retrain can't drift the code layout.
    *
    * Cost shape: one k-means run (iters × map-only assignment over
    * the corpus + k·dim-scalar recompute), one corpus re-assign
    * (broadcast cents), one corpus re-encode (broadcast codebook),
    * one index rewrite — the same corpus-wide passes as [[write]],
    * which is the floor for any full retrain. Run it at maintenance
    * cadence when [[fit]]'s mean decays, not per batch. Returns the
    * new version. */
  def retrain(spark: SparkSession, name: String, k: Int = 16,
              iters: Int = 2, buckets: Int = 32): Int = {
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no ANN index named $name"))
    val stored = spark.table(s"${name}_vectors_v$v")
    val corpus = stored.select(col("neighbor_id").as("vec_id"),
      col("embedding"))
    // geometry from the stored codebook: m×nCodes rows — control-plane
    val geo = spark.table(s"${name}_codebook_v$v")
      .agg(countDistinct(col("code_id")).as("nCodes"),
        (max(col("j")) + 1).as("m"), max(size(col("cw"))).as("sub")).head()
    val (nCodes, m, sub) =
      (geo.getLong(0).toInt, geo.getInt(1), geo.getInt(2))
    val cents = Knn.assembleCentroids(KMeans.lloyd(corpus, k, iters))
    val c = Pq.prep(corpus)
    val cb = sampleCodebook(c, nCodes, m, sub)
    commit(spark, name, cents, cb,
      assign(c, broadcast(cents)), encode(c, broadcast(cb)),
      stored, buckets,
      if (hasMeta(spark, name, v)) Some(spark.table(s"${name}_meta_v$v"))
      else None,
      // a retrain re-fits quantizers and re-encodes, but the stored
      // vectors (and metadata) pass through UNTOUCHED — carry them so
      // the rewrite never pays a corpus-sized vector copy
      carry = BucketedStore.Carry("vectors", v) +:
        (if (hasMeta(spark, name, v)) Seq(BucketedStore.Carry("meta", v))
        else Nil))
  }

  /** Maintenance thresholds for [[maintain]]: retrain fires when any
    * band is crossed. Defaults encode the SCALING.md guidance — a cell
    * holding over a quarter of the corpus starves probe selectivity,
    * half the cells sitting empty wastes probe budget, and a
    * corpus-weighted mean fit below the floor means ADC scoring
    * quality has drifted (the e19b decay signal). */
  final case class MaintainPolicy(
      maxCellShare: Double = 0.25,
      maxEmptyFrac: Double = 0.5,
      minMeanFit: Double = 0.5,
      k: Int = 16, iters: Int = 2, buckets: Int = 32)

  /** Auto-maintenance — [[stats]] (occupancy skew) + [[fit]] (quantizer
    * tightness) composed into the retrain DECISION, with the decision
    * recorded in a replay-safe ledger (the [[graft.operators.Scheduler
    * .runDue]] pattern: the examined index VERSION is the unit of
    * work). Each index version gets AT MOST one decision: a second
    * `maintain` call on the same version is a no-op returning the
    * recorded row, so a host timer may tick as often as it likes
    * without double-retraining; a version created BY a retrain is a
    * fresh occurrence and gets its own (normally healthy) row on the
    * next tick. Signals are control-plane sized (nCentroids rows);
    * the retrain itself is [[retrain]]'s corpus passes — exactly the
    * cost this policy exists to spend only when the bands say so.
    * Returns the one decision row: (index, version, action,
    * new_version, max_cell_share, empty_frac, mean_fit, reasons). */
  def maintain(spark: SparkSession, name: String, ledgerDir: String,
               policy: MaintainPolicy = MaintainPolicy()): DataFrame = {
    import spark.implicits._
    import graft.sources.SnapshotStore
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no ANN index named $name"))
    val prior = SnapshotStore.read(spark, ledgerDir).map(
      _.filter(col("index") === name && col("version") === v))
    prior.filter(_.limit(1).count() > 0) match {
      case Some(row) => row // this version already decided — replay-safe
      case None =>
        // CLAIM the version before examining it (r17 — the
        // knnGraphLedgered claim-then-build pattern, scoped to the
        // harm that matters here): two occurrences ticking the same
        // version concurrently could BOTH cross a band and retrain —
        // two corpus-sized rebuilds and two new versions. Exactly one
        // wins the atomic claim and proceeds; a loser whose winner
        // has not yet merged its row fails FAST with the claim named
        // (the winner's row lands when its examination — possibly a
        // retrain — completes; the next tick then replays it). A
        // winner that DIES mid-examination leaves the claim visible
        // with no row: operator removes `_claim_<token>` and the next
        // tick re-examines — crash recovery is operator-visible, not
        // a silent second retrain. (Unlike the graph ledger the
        // decision here is not claim-time computable — new_version
        // exists only after the retrain — so the claim cannot carry
        // the payload for self-healing.)
        val token = "maintain_" + name.getBytes("UTF-8")
          .map("%02x".format(_)).mkString + "_v" + v
        if (!SnapshotStore.tryClaim(ledgerDir, token, "examining")) {
          throw new IllegalStateException(
            s"AnnIndex.maintain: version $v of '$name' is claimed by " +
              s"a concurrent occurrence whose decision row has not " +
              s"landed in '$ledgerDir' — re-tick after it completes, " +
              s"or remove _claim_$token if that occurrence died.")
        }
        val occ = stats(spark, name)
          .agg(max(col("share")).as("mx"),
            (sum(when(col("n_vectors") === 0, 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("empty"))
          .head()
        val (maxShare, emptyFrac) = (occ.getDouble(0), occ.getDouble(1))
        val fitRows = fit(spark, name)
          .agg((sum(col("mean_fit") * col("n_vectors")) /
            sum(col("n_vectors"))).as("wf")).head()
        // an index with no stored vectors has no fit signal — treat as
        // tight rather than NPE/retraining an empty corpus
        val meanFit = if (fitRows.isNullAt(0)) 1.0 else fitRows.getDouble(0)
        val reasons = Seq(
          if (maxShare > policy.maxCellShare)
            Some(f"cell_share ${maxShare}%.4f > ${policy.maxCellShare}%.2f")
          else None,
          if (emptyFrac > policy.maxEmptyFrac)
            Some(f"empty_frac ${emptyFrac}%.4f > ${policy.maxEmptyFrac}%.2f")
          else None,
          if (meanFit < policy.minMeanFit)
            Some(f"mean_fit ${meanFit}%.4f < ${policy.minMeanFit}%.2f")
          else None).flatten
        val newV = if (reasons.nonEmpty)
          retrain(spark, name, policy.k, policy.iters, policy.buckets)
        else v
        val action = if (reasons.nonEmpty) "retrained" else "healthy"
        val row = Seq((name, v, action, newV, maxShare, emptyFrac,
          meanFit, reasons.mkString("; ")))
          .toDF("index", "version", "action", "new_version",
            "max_cell_share", "empty_frac", "mean_fit", "reasons")
        SnapshotStore.mergeInto(row, ledgerDir, Seq("index", "version"))
        row
    }
  }

  /** IVF-PQ top-k against the current index version — same pipeline,
    * ranking, and output schema as [[Pq.ivfPqTopK]], but every
    * corpus-sized input is a bucketed index scan: candidates join
    * `_assign` on its bucket key, ADC scores `_codes` on its bucket
    * key, and only |Q| x shortlist rows of `_vectors` are fetched. */
  def topK(spark: SparkSession, name: String, queries: DataFrame, k: Int,
           nProbe: Int = 4, shortlist: Int = 100): DataFrame =
    probe(spark, name, queries, k, nProbe, shortlist, filterKeys = Nil)

  /** Coarse-quantizer FIT report — [[stats]]' companion and the other
    * half of the retrain signal (occupancy says whether cells are
    * BALANCED; this says whether they are TIGHT): per occupied cell,
    * the exact-decimal mean cosine between each stored vector and its
    * assigned centroid. A cell whose mean fit decays as batches MERGE
    * in under the frozen quantizers is drifting away from its
    * centroid — ADC scoring quality degrades silently until a
    * retrain (e4) re-centers it; this report is the maintenance-
    * cadence number that says when. One bucketed-assign ⋈ vectors
    * join + a broadcast cents attach + a partial-aggregating per-cell
    * rollup — a maintenance-time scan, never on the probe path. */
  def fit(spark: SparkSession, name: String): DataFrame = {
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no ANN index named $name"))
    val cents = broadcast(spark.table(s"${name}_cents_v$v"))
    val vecs = spark.table(s"${name}_vectors_v$v")
      .select(col("neighbor_id"),
        Vectors.asDouble(col("embedding")).as("ce"), col("cn"))
    spark.table(s"${name}_assign_v$v")
      .join(vecs, "neighbor_id")
      .join(cents, "cent_id")
      .withColumn("csim", centSim(col("ce"), col("cn")))
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vectors"),
        // §6 quantizer on the mean quotient (Quantize scaladoc)
        graft.functions.Quantize.qdp(
          sum(col("csim").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
            .cast("double") / count(lit(1)), 6).as("mean_fit"))
  }

  /** Cell-occupancy report over the persisted index — the ANN twin of
    * `Skew.keyShareReport` (g30) and the planning input behind nProbe
    * and retrain decisions: per centroid, vectors assigned and the
    * corpus share. A skewed report means probes pay full cost on hot
    * cells while empty cells waste probe budget — the signal to
    * retrain the coarse quantizer (e4) or raise nCentroids (the
    * √|V| sizing SCALING.md measures). Cells with ZERO occupancy
    * still report (left join from the cents member) — an empty cell
    * IS the finding. One partial-aggregating count over the assign
    * member (bucketed on cent_id — the count never re-shuffles
    * corpus-sized data), output nCentroids-sized; the share is a
    * single IEEE division of exact longs, rounded 6 dp. */
  def stats(spark: SparkSession, name: String): DataFrame = {
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no ANN index named $name"))
    val occ = spark.table(s"${name}_assign_v$v")
      .groupBy("cent_id").agg(count(lit(1)).as("n_vectors"))
    val tot = occ.agg(sum(col("n_vectors")).as("__tot"))
    spark.table(s"${name}_cents_v$v").select("cent_id")
      .join(occ, Seq("cent_id"), "left")
      .na.fill(0L, Seq("n_vectors"))
      .crossJoin(broadcast(tot))
      .select(col("cent_id"), col("n_vectors"),
        // §6 quantizer (Quantize scaladoc): engine-identical at the
        // half boundary, unlike round(double, n)
        graft.functions.Quantize.qdp(
          col("n_vectors").cast("double") / col("__tot").cast("double"), 6)
          .as("share"))
  }

  /** [[topK]] restricted to corpus vectors sharing the query's
    * `filterKeys` metadata — filtered ANN search at the INDEX level
    * (the e11 brute-force leg's persisted twin): the index must have
    * been written with `metaCols` covering `filterKeys`, and the
    * equality filter lands on the CANDIDATE set (probed cells ⋈ meta),
    * BEFORE ADC scoring — so the shortlist holds only admissible
    * neighbors and the top-k can never underfill by post-filtering,
    * the failure mode of filter-after-search. Costs one extra
    * bucketed-meta join on the candidate sliver; everything
    * corpus-sized stays a bucketed scan. */
  def topKFiltered(spark: SparkSession, name: String, queries: DataFrame,
                   filterKeys: Seq[String], k: Int,
                   nProbe: Int = 4, shortlist: Int = 100): DataFrame = {
    require(filterKeys.nonEmpty, "topKFiltered needs at least one filter key")
    probe(spark, name, queries, k, nProbe, shortlist, filterKeys)
  }

  private def probe(spark: SparkSession, name: String, queries: DataFrame,
                    k: Int, nProbe: Int, shortlist: Int,
                    filterKeys: Seq[String]): DataFrame = {
    // pin ONE version up front and read every table at it — the probe
    // can never resolve a torn snapshot from a concurrent commit
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no ANN index named $name"))
    if (filterKeys.nonEmpty)
      require(hasMeta(spark, name, v),
        s"index $name has no metadata member; write it with metaCols")
    val cents = broadcast(spark.table(s"${name}_cents_v$v"))
    val cb = broadcast(spark.table(s"${name}_codebook_v$v"))
    val q = queries.select((col("vec_id").as("query_id") +:
        filterKeys.map(fk => col(fk).as(s"__q_$fk"))) :+
        Vectors.asDouble(col("embedding")).as("qe"): _*)
      .withColumn("qn", Vectors.norm(col("qe")))
    val probes = q.join(cents)
      .withColumn("csim", centSim(col("qe"), col("qn")))
      .groupBy("query_id")
      .agg(Knn.topKAgg(col("csim"), col("cent_id"), nProbe).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("cent_id"))
    val qtab = broadcast(q.join(cb)
      .select(col("query_id"), col("j"), col("code_id").as("code"),
        graft.functions.Quantize.qdp(Vectors.dot(
          slice(col("qe"), col("j") * size(col("cw")) + 1, size(col("cw"))),
          col("cw")), 6).as("qdot")))
    val rawCand = probes
      .join(spark.table(s"${name}_assign_v$v"), "cent_id")
      .select("query_id", "neighbor_id")
    // metadata filter BEFORE ADC: join the bucketed meta member on the
    // candidate sliver, then keep rows matching the query's own values
    // (broadcast — the query batch is probe-sized). Inner equality:
    // NULL metadata never matches, like the brute leg's equi-join.
    val cand =
      if (filterKeys.isEmpty) rawCand
      else filterKeys.foldLeft(
        rawCand
          .join(spark.table(s"${name}_meta_v$v"), "neighbor_id")
          .join(broadcast(q.select(col("query_id") +:
            filterKeys.map(fk => col(s"__q_$fk")): _*)), "query_id")) {
        (df, fk) => df.filter(col(fk) === col(s"__q_$fk"))
      }.select("query_id", "neighbor_id")
    val adc = cand
      .join(spark.table(s"${name}_codes_v$v"), "neighbor_id")
      .join(qtab, Seq("query_id", "j", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(round(sum(col("qdot").cast("decimal(28,12)")), 6).cast("double")
        .as("adc"))
    val short = adc.groupBy("query_id")
      .agg(Knn.topKAgg(col("adc"), col("neighbor_id"), shortlist).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("neighbor_id"))
    val scored = short
      .join(q.select("query_id", "qe", "qn"), "query_id")
      .join(spark.table(s"${name}_vectors_v$v")
        .select(col("neighbor_id"),
          Vectors.asDouble(col("embedding")).as("ce"), col("cn")),
        "neighbor_id")
      .withColumn("sim",
        Vectors.qcos(col("qe"), col("ce"), col("qn") * col("cn")))
    Knn.rankTopK(scored.select("query_id", "neighbor_id", "sim"), k)
  }
}
