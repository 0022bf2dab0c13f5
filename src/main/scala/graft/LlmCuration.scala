package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.storage.StorageLevel

import graft.dedup.TextDedup
import graft.text.{Dsir, NaiveBayes, TextAnalysis}

/** End-to-end training-data curation pipeline — the document-corpus
  * analog of [[Medallion.run]]: chain the standard curation stages in
  * the order a production pipeline runs them, each stage the library
  * operator it names.
  *
  *  1. quality + language gate (map-only: C4-style score + stopword
  *     language ID, both at scan speed, no shuffle);
  *  2. exact dedup: keep the min-id document per content hash (one
  *     keyed shuffle on the hash);
  *  3. near-dup dedup: MinHash+LSH candidate pairs over the surviving
  *     corpus, verified Jaccard, greedy keep-lowest-id (banded shuffle
  *     + bounded bucket joins — the 100 TB shape, see
  *     [[TextDedup.minHashLshPairs]]);
  *  4. survivors = left_anti on the drop set (one keyed shuffle).
  *
  * Stage order matters at scale: the map-only gates run first so every
  * shuffle-bearing stage sees the smallest possible corpus.
  */
object LlmCuration {

  /** Run the pipeline; returns the surviving doc ids.
    *
    * @param minQuality  minimum composite quality score (see
    *                    [[TextAnalysis.qualityFeatures]])
    * @param lang        keep only docs identified as this language
    *                    (None = no language gate)
    * @param minJaccard  near-dup threshold for the MinHash stage
    * @param storage     cache level for the operator-internal frames
    *                    (see [[Caching]]; NONE disables caching) */
  def run(docs: DataFrame, id: Column, text: Column,
          minQuality: Double = 0.5, lang: Option[String] = Some("en"),
          minJaccard: Double = 0.1,
          storage: StorageLevel = Caching.Default): DataFrame = {
    val kept = gateStage(docs, id, text, minQuality, lang)
    // cached: feeds both the near-dup pair generation and the final
    // left_anti — without it the gates + hash-dedup shuffle run twice
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    nearDupStage(uniq, minJaccard, storage).select("doc_id")
  }

  /** Stage 1: the map-only quality + language gate → (doc_id, text).
    * Factored out so [[run]] and [[attritionReport]] cannot drift. */
  private def gateStage(docs: DataFrame, id: Column, text: Column,
                        minQuality: Double,
                        lang: Option[String]): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val scored = TextAnalysis.qualityFeatures(base, col("text"))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
    lang.foldLeft(scored.filter(col("quality_score") >= minQuality)) {
      (df, l) => df.filter(col("lang_pred") === l)
    }.select("doc_id", "text")
  }

  /** Stage 2: exact dedup, min-id keeper per content hash. */
  private def exactDedupStage(kept: DataFrame): DataFrame =
    kept.groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
      .select("doc_id", "text")

  /** Stage 3: near-dup apply — survivors of the greedy MinHash-LSH
    * drop, keeping (doc_id, text). */
  private def nearDupStage(uniq: DataFrame, minJaccard: Double,
                           storage: StorageLevel): DataFrame = {
    val pairs = TextDedup.minHashLshPairs(uniq, col("doc_id"), col("text"),
      minJaccard, storage)
    uniq.join(pairs.select(col("doc_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** Corpus report card — the per-source summary a data team reads
    * BEFORE choosing mixture weights (the decision input upstream of
    * [[run]]'s gates and `Sampling.mix`'s recipe: which feeds are
    * big, clean, duplicated, multilingual): per source, doc count,
    * distinct languages, exact-duplicate membership (docs whose text
    * md5 is shared with ANY doc corpus-wide — cross-source mirrors
    * count in both sources, which is the number that matters for
    * mixing), token mass, and 6-dp exact-decimal means of the t2
    * quality score and tokens-per-doc.
    *
    * Scale: one map-only feature pass, one keyed md5 count + one
    * equi-join back, one partial-aggregated rollup to sources-sized
    * output. Means are single IEEE divisions of exact decimal sums. */
  def corpusReport(docs: DataFrame, id: Column, text: Column,
                   source: Column, lang: Column): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"),
      source.as("source"), lang.as("lang"))
    val scored = TextAnalysis.qualityFeatures(base, col("text"))
      .withColumn("__h", md5(col("text")))
    val hc = scored.groupBy("__h").agg(count(lit(1)).as("__hc"))
    scored.join(hc, "__h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("__hc") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        // §6 quantizer on the mean quotients (Quantize scaladoc):
        // engine-identical at the half boundary
        graft.functions.Quantize.qdp(
          sum(col("quality_score").cast(DecimalType(18, 6)))
            .cast(DoubleType) / count(lit(1)), 6).as("mean_quality"),
        graft.functions.Quantize.qdp(
          sum(col("n_tokens")).cast(DoubleType) / count(lit(1)), 6)
          .as("mean_tokens"))
      .withColumn("dup_frac",
        graft.functions.Quantize.qdp(col("n_dup_docs").cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6))
  }

  /** [[run]] plus the decontamination stage a training corpus runs
    * LAST (stage 5): survivors sharing any word `n`-gram with the eval
    * corpus are dropped ([[graft.dedup.Decontaminate.applyFilter]] —
    * broadcast eval shingle set, map-only probe). Last because the
    * probe then sees the smallest surviving corpus, and because eval
    * membership must win over every retention decision: if the eval
    * docs themselves ride in `docs` (the usual setup), they self-hit
    * and drop here regardless of how curation ranked them.
    *
    * Lifecycle: the returned frame is lazy, so the persisted stage
    * boundaries (uniq/surv) cannot be unpersisted here — the CALLER
    * owns their lifecycle (the [[graft.Caching]] contract): pass
    * `StorageLevel.NONE` to opt out in a long-lived session, or
    * unpersist after the terminal action (the [[attritionReport]]
    * family, which owns its actions, does exactly that). */
  def runDecontaminated(docs: DataFrame, eval: DataFrame,
                        id: Column, text: Column,
                        minQuality: Double = 0.5,
                        lang: Option[String] = Some("en"),
                        minJaccard: Double = 0.1, n: Int = 5,
                        storage: StorageLevel = Caching.Default): DataFrame = {
    val kept = gateStage(docs, id, text, minQuality, lang)
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    // survivors carry their own (doc_id, text) — no join-back to the
    // raw corpus; persisted because the decontaminate anti-join reads
    // the frame twice (probe side + keep side)
    val surv = Caching.staged(
      nearDupStage(uniq, minJaccard, storage), storage)
    graft.dedup.Decontaminate.applyFilter(surv, eval, "doc_id", col("text"), n)
      .select("doc_id")
  }

  /** Stage 4 (model gate): keep survivors the TRAINED classifier
    * routes to `keepLabel` with margin >= `minMargin` — the
    * production refinement of stage 1's heuristic gate (Brown et al.
    * 2020 §A2's quality-classifier shape: rule-gate first, a learned
    * gate confirms). The model and priors are trained ONCE on
    * `labeled` (vocabulary/label-sized frames, broadcast by
    * [[NaiveBayes.score]]); scoring the pool is map-only plus one
    * (doc, label)-keyed in-batch aggregation. Docs the model has NO
    * evidence for (all tokens out-of-vocabulary → no score row, or a
    * null margin) drop: a selection gate admits on evidence, it does
    * not pass on silence. Factored so [[runSelected]] and
    * [[attritionReportSelected]] cannot drift. */
  private def modelGateStage(pool: DataFrame, labeled: DataFrame,
                             labeledText: Column, label: Column,
                             keepLabel: String, minMargin: Double,
                             storage: StorageLevel): DataFrame = {
    val m = NaiveBayes.model(labeled, labeledText, label, storage)
    val pri = NaiveBayes.priors(labeled, label)
    modelGateApply(pool, m, pri, keepLabel, minMargin)
  }

  /** Stage 4 in its SERVING form: the model gate applied with a
    * PRE-TRAINED (frozen) model + priors — the scoring half
    * [[modelGateStage]] executes after training. Factored so the
    * lifecycle form and the steady-state form cannot drift. */
  private def modelGateApply(pool: DataFrame, nbModel: DataFrame,
                             nbPriors: DataFrame, keepLabel: String,
                             minMargin: Double): DataFrame = {
    val admitted = NaiveBayes.score(pool, col("doc_id"), col("text"),
        nbModel, nbPriors)
      .filter(col("pred") === keepLabel &&
        col("margin").isNotNull && col("margin") >= minMargin)
      .select("doc_id")
    pool.join(admitted, Seq("doc_id"))
  }

  /** Stage 5 (DSIR select): keep the `k` pool docs a without-
    * replacement ∝exp(weight) draw selects toward `target`'s domain
    * ([[Dsir.resample]] — Xie et al. 2023's select-then-train step,
    * deterministic Gumbel top-k riding the bounded-heap rewrite).
    * The k-row selection broadcasts back onto the pool. */
  private def dsirSelectStage(pool: DataFrame, target: DataFrame,
                              targetText: Column, k: Int): DataFrame =
    pool.join(
      broadcast(Dsir.resample(target.select(targetText.as("text")), pool,
        col("doc_id"), col("text"), k).select("doc_id")),
      Seq("doc_id"))

  /** Stage 5 in its SERVING form: the DSIR draw under a PRE-BUILT
    * (frozen) importance model — [[Dsir.resampleWith]] instead of the
    * train-and-draw [[dsirSelectStage]]. Identical selection when the
    * model was built from the same (target, pool) inputs. */
  private def dsirSelectApply(pool: DataFrame, dsirModel: DataFrame,
                              k: Int): DataFrame =
    pool.join(
      broadcast(Dsir.resampleWith(dsirModel, pool, col("doc_id"),
        col("text"), k).select("doc_id")),
      Seq("doc_id"))

  /** [[runDecontaminated]] grown into the full SELECTION pipeline a
    * training-data team actually ships (the brief's production shape):
    * rule gate → exact dedup → near-dup → TRAINED model gate
    * ([[modelGateStage]]) → DSIR importance selection
    * ([[dsirSelectStage]]) → decontaminate. Decontamination stays
    * LAST for [[runDecontaminated]]'s reason — eval membership must
    * win over every retention decision, including the model's and the
    * sampler's. Returns the selected, decontaminated doc ids.
    *
    * Scale shape: every stage sees the smallest surviving corpus; the
    * model/priors and the DSIR bucket model are fixed-size broadcast
    * frames, the k-row selection broadcasts back, and each stage
    * boundary persists under `storage` so no stage's subtree
    * re-executes across the chain's branches (caller-owned lifecycle —
    * [[runDecontaminated]]'s note).
    *
    * @param labeled   labeled training docs for the model gate
    * @param target    target-domain docs for the DSIR weights
    * @param keepLabel the model-gate route to admit
    * @param minMargin model-gate confidence floor (rounded-6dp units)
    * @param k         DSIR selection size */
  def runSelected(docs: DataFrame, eval: DataFrame, labeled: DataFrame,
                  target: DataFrame, id: Column, text: Column,
                  label: Column, keepLabel: String, minMargin: Double,
                  k: Int,
                  minQuality: Double = 0.5, lang: Option[String] = Some("en"),
                  minJaccard: Double = 0.1, n: Int = 5,
                  storage: StorageLevel = Caching.Default): DataFrame = {
    val kept = gateStage(docs, id, text, minQuality, lang)
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    val surv = Caching.staged(
      nearDupStage(uniq, minJaccard, storage), storage)
    val gated = Caching.staged(
      modelGateStage(surv, labeled, text, label, keepLabel, minMargin,
        storage), storage)
    val sel = Caching.staged(
      dsirSelectStage(gated, target, text, k), storage)
    graft.dedup.Decontaminate.applyFilter(sel, eval, "doc_id", col("text"), n)
      .select("doc_id")
  }

  /** The frozen artifacts [[runSelectedServing]] consumes — train ONCE
    * what [[runSelected]] re-trains per invocation: the NB (model,
    * priors) from `labeled`, and the DSIR importance model from
    * (`target`, the model-gated pool) — the DSIR raw side is the pool
    * the draw will score, so building it requires one pipeline pass
    * through stage 4 (the build cost the steady-state leg amortizes).
    * Returns (nbModel, nbPriors, dsirModel); all three are fixed-size
    * broadcastable frames — persist AND materialize them before
    * serving (the [[graft.streaming.SelectionPipelineStream]]
    * contract: re-training any artifact is a new artifact). */
  def selectionArtifacts(docs: DataFrame, labeled: DataFrame,
                         target: DataFrame, id: Column, text: Column,
                         label: Column, keepLabel: String,
                         minMargin: Double,
                         minQuality: Double = 0.5,
                         lang: Option[String] = Some("en"),
                         minJaccard: Double = 0.1,
                         storage: StorageLevel = Caching.Default)
      : (DataFrame, DataFrame, DataFrame) = {
    val m = NaiveBayes.model(labeled, text, label, storage)
    val pri = NaiveBayes.priors(labeled, label)
    val kept = gateStage(docs, id, text, minQuality, lang)
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    val surv = Caching.staged(
      nearDupStage(uniq, minJaccard, storage), storage)
    val gated = modelGateApply(surv, m, pri, keepLabel, minMargin)
    val dsir = Dsir.model(target.select(text.as("text")), gated,
      col("text"))
    (m, pri, dsir)
  }

  /** [[runSelected]]'s STEADY-STATE serving leg (the e6/e6b split for
    * the selection pipeline): the same gate → exact dedup → near-dup →
    * model gate → DSIR select → decontaminate chain, but the NB model/
    * priors and the DSIR importance model arrive PRE-TRAINED
    * ([[selectionArtifacts]]) instead of being rebuilt in-plan — the
    * invocation only pays the per-corpus serving stages, which is the
    * latency a selection service actually quotes (the batch twin of
    * [[graft.streaming.SelectionPipelineStream]]'s frozen-artifact
    * contract).
    *
    * Output is IDENTICAL to [[runSelected]] when the artifacts were
    * built by [[selectionArtifacts]] from the same inputs: the NB
    * model depends only on `labeled`, the DSIR model only on
    * (`target`, the stage-4 pool), and both pipelines apply the same
    * factored stage functions — so the Gumbel top-k draw replays
    * bit-identically (no threshold approximation; the streaming form's
    * documented Gumbel-vs-threshold deviation does not apply here).
    *
    * Lifecycle: persisted stage boundaries follow
    * [[runDecontaminated]]'s caller-owns contract. */
  def runSelectedServing(docs: DataFrame, eval: DataFrame,
                         nbModel: DataFrame, nbPriors: DataFrame,
                         dsirModel: DataFrame,
                         id: Column, text: Column,
                         keepLabel: String, minMargin: Double, k: Int,
                         minQuality: Double = 0.5,
                         lang: Option[String] = Some("en"),
                         minJaccard: Double = 0.1, n: Int = 5,
                         storage: StorageLevel = Caching.Default): DataFrame = {
    val kept = gateStage(docs, id, text, minQuality, lang)
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    val surv = Caching.staged(
      nearDupStage(uniq, minJaccard, storage), storage)
    val gated = Caching.staged(
      modelGateApply(surv, nbModel, nbPriors, keepLabel, minMargin),
      storage)
    val sel = Caching.staged(
      dsirSelectApply(gated, dsirModel, k), storage)
    graft.dedup.Decontaminate.applyFilter(sel, eval, "doc_id", col("text"), n)
      .select("doc_id")
  }

  /** [[attritionReportSelected]]'s steady-state twin: the same
    * per-stage ops log over [[runSelectedServing]]'s chain (frozen
    * artifacts, serving stages only). Stage rows are identical to the
    * lifecycle report's when the artifacts came from
    * [[selectionArtifacts]] on the same inputs. */
  def attritionReportServing(docs: DataFrame, eval: DataFrame,
                             nbModel: DataFrame, nbPriors: DataFrame,
                             dsirModel: DataFrame,
                             id: Column, text: Column,
                             keepLabel: String, minMargin: Double, k: Int,
                             minQuality: Double = 0.5,
                             lang: Option[String] = Some("en"),
                             minJaccard: Double = 0.1, n: Int = 5,
                             storage: StorageLevel = Caching.Default): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nAll = docs.count()
    val kept = Caching.staged(
      gateStage(docs, id, text, minQuality, lang), storage)
    val nKept = kept.count()
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    val nUniq = uniq.count()
    val surv = Caching.staged(
      nearDupStage(uniq, minJaccard, storage), storage)
    val nSurv = surv.count()
    val gated = Caching.staged(
      modelGateApply(surv, nbModel, nbPriors, keepLabel, minMargin),
      storage)
    val nGated = gated.count()
    val sel = Caching.staged(
      dsirSelectApply(gated, dsirModel, k), storage)
    val nSel = sel.count()
    val clean = graft.dedup.Decontaminate.applyFilter(
      sel, eval, "doc_id", col("text"), n)
    val nClean = clean.count()
    Seq(kept, uniq, surv, gated, sel).foreach(_.unpersist())
    Seq((1, "gate", nAll, nKept),
        (2, "exact_dedup", nKept, nUniq),
        (3, "near_dup", nUniq, nSurv),
        (4, "model_gate", nSurv, nGated),
        (5, "dsir_select", nGated, nSel),
        (6, "decontam", nSel, nClean))
      .toDF("stage_no", "stage", "n_in", "n_out")
      .withColumn("drop_frac", when(col("n_in") === 0, lit(null))
        .otherwise(graft.functions.Quantize.qdp(lit(1.0) -
          col("n_out").cast("double") / col("n_in").cast("double"), 6)))
  }

  /** Per-stage attrition rows over [[runSelected]]'s chain — c5's
    * ops-log discipline extended to the selection stages (a model
    * gate suddenly eating 60% is a drifted model or a drifted feed;
    * dsir_select's n_out is k by construction unless the pool fell
    * below k — both worth alarming on). Same factored stage
    * functions; report and pipeline cannot drift. */
  def attritionReportSelected(docs: DataFrame, eval: DataFrame,
                              labeled: DataFrame, target: DataFrame,
                              id: Column, text: Column, label: Column,
                              keepLabel: String, minMargin: Double, k: Int,
                              minQuality: Double = 0.5,
                              lang: Option[String] = Some("en"),
                              minJaccard: Double = 0.1, n: Int = 5,
                              storage: StorageLevel = Caching.Default): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nAll = docs.count()
    val kept = Caching.staged(
      gateStage(docs, id, text, minQuality, lang), storage)
    val nKept = kept.count()
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    val nUniq = uniq.count()
    val surv = Caching.staged(
      nearDupStage(uniq, minJaccard, storage), storage)
    val nSurv = surv.count()
    val gated = Caching.staged(
      modelGateStage(surv, labeled, text, label, keepLabel, minMargin,
        storage), storage)
    val nGated = gated.count()
    val sel = Caching.staged(
      dsirSelectStage(gated, target, text, k), storage)
    val nSel = sel.count()
    val clean = graft.dedup.Decontaminate.applyFilter(
      sel, eval, "doc_id", col("text"), n)
    val nClean = clean.count()
    Seq(kept, uniq, surv, gated, sel).foreach(_.unpersist())
    Seq((1, "gate", nAll, nKept),
        (2, "exact_dedup", nKept, nUniq),
        (3, "near_dup", nUniq, nSurv),
        (4, "model_gate", nSurv, nGated),
        (5, "dsir_select", nGated, nSel),
        (6, "decontam", nSel, nClean))
      .toDF("stage_no", "stage", "n_in", "n_out")
      // null, not 0/0, when an upstream stage emptied the corpus (a
      // fully-draining model gate is a legal, alarm-worthy outcome)
      .withColumn("drop_frac", when(col("n_in") === 0, lit(null))
        .otherwise(graft.functions.Quantize.qdp(lit(1.0) -
          col("n_out").cast("double") / col("n_in").cast("double"), 6)))
  }

  /** The crawl front door's ops log — c3's raw-markup chain with the
    * d20 URL/domain blocklist gate composed as STAGE 0 (the
    * RefinedWeb/UT1 order: a blocked domain kills the page before any
    * text is extracted, so every downstream stage sees a smaller
    * corpus): url_gate → extract (docs whose boilerplate-stripped
    * extraction is empty drop — a nav-and-footer-only page carries no
    * trainable text) → quality/language gate → exact dedup → near-dup.
    * Same per-stage persisted-count discipline as [[attritionReport]];
    * the stages are the library operators themselves
    * ([[graft.text.Urls.blocklistGate]], [[graft.text.Html.extract]],
    * [[gateStage]]/[[exactDedupStage]]/[[nearDupStage]]) so report and
    * pipeline cannot drift. */
  def attritionReportCrawl(pages: DataFrame, id: Column, url: Column,
                           html: Column,
                           blockedDomains: Seq[String],
                           patternRules: Seq[(String, String)],
                           minQuality: Double = 0.5,
                           lang: Option[String] = Some("en"),
                           minJaccard: Double = 0.1,
                           storage: StorageLevel = Caching.Default): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val base = pages.select(id.as("doc_id"), url.as("url"), html.as("html"))
    val nAll = base.count()
    val verdict = graft.text.Urls.blocklistGate(base, col("doc_id"),
      col("url"), blockedDomains, patternRules)
    val allowed = Caching.staged(
      base.join(verdict.filter(col("allowed")).select("doc_id"),
        Seq("doc_id")), storage)
    val nAllowed = allowed.count()
    val extracted = Caching.staged(
      graft.text.Html.extract(allowed, col("doc_id"), col("html"))
        .select(col("doc_id"), col("extracted").as("text"))
        .filter(length(col("text")) > 0), storage)
    val nExtracted = extracted.count()
    val kept = Caching.staged(
      gateStage(extracted, col("doc_id"), col("text"), minQuality, lang),
      storage)
    val nKept = kept.count()
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    val nUniq = uniq.count()
    val surv = Caching.staged(
      nearDupStage(uniq, minJaccard, storage), storage)
    val nSurv = surv.count()
    Seq(allowed, extracted, kept, uniq, surv).foreach(_.unpersist())
    Seq((1, "url_gate", nAll, nAllowed),
        (2, "extract", nAllowed, nExtracted),
        (3, "gate", nExtracted, nKept),
        (4, "exact_dedup", nKept, nUniq),
        (5, "near_dup", nUniq, nSurv))
      .toDF("stage_no", "stage", "n_in", "n_out")
      .withColumn("drop_frac", when(col("n_in") === 0, lit(null))
        .otherwise(graft.functions.Quantize.qdp(lit(1.0) -
          col("n_out").cast("double") / col("n_in").cast("double"), 6)))
  }

  /** Per-stage attrition report over [[runDecontaminated]]'s chain —
    * the ops log every curation run emits (HOW MUCH did each stage
    * drop; a gate suddenly eating 40% instead of 4% is a feed
    * regression, a near-dup stage dropping ~0% says the corpus was
    * already deduped upstream): one row per stage with rows in / rows
    * out / drop fraction, stages the EXACT same factored functions
    * [[run]] executes ([[gateStage]]/[[exactDedupStage]]/
    * [[nearDupStage]] — report and pipeline cannot drift).
    *
    * The four counts are control-plane one-row aggregates (the
    * [[Medallion.run]] metrics pattern); each intermediate is
    * persisted so a stage's corpus is computed once and fed to both
    * its count and the next stage. drop_frac is one IEEE division of
    * exact longs, rounded 6 dp. */
  def attritionReport(docs: DataFrame, eval: DataFrame,
                      id: Column, text: Column,
                      minQuality: Double = 0.5,
                      lang: Option[String] = Some("en"),
                      minJaccard: Double = 0.1, n: Int = 5,
                      storage: StorageLevel = Caching.Default): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nAll = docs.count()
    val kept = Caching.staged(
      gateStage(docs, id, text, minQuality, lang), storage)
    val nKept = kept.count()
    val uniq = Caching.staged(exactDedupStage(kept), storage)
    val nUniq = uniq.count()
    val surv = Caching.staged(
      nearDupStage(uniq, minJaccard, storage), storage)
    val nSurv = surv.count()
    val clean = graft.dedup.Decontaminate.applyFilter(
      surv, eval, "doc_id", col("text"), n)
    val nClean = clean.count()
    Seq(kept, uniq, surv).foreach(_.unpersist())
    Seq((1, "gate", nAll, nKept),
        (2, "exact_dedup", nKept, nUniq),
        (3, "near_dup", nUniq, nSurv),
        (4, "decontam", nSurv, nClean))
      .toDF("stage_no", "stage", "n_in", "n_out")
      // §6 quantizer (Quantize scaladoc): engine-identical at the
      // half boundary, unlike round(double, n)
      .withColumn("drop_frac", graft.functions.Quantize.qdp(lit(1.0) -
        col("n_out").cast("double") / col("n_in").cast("double"), 6))
  }
}
