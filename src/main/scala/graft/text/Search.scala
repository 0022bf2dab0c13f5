package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import org.apache.spark.storage.StorageLevel

import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.TopKPairs

/** Keyword (lexical) retrieval over a document corpus — the BM25
  * ranking function (Robertson & Zaragoza 2009; the Okapi BM25 form
  * with Lucene's +1 idf floor so idf is never negative). Complements
  * the `graft.ann` family: production retrieval runs lexical and
  * vector search side by side, and BM25 is the standard lexical leg.
  *
  * Scale shape — the inverted-index build is the only corpus-wide
  * work, and every stage is an equi-join or a partial aggregation:
  *
  *  1. postings: explode → map-side-combined (doc, token) counts,
  *     one shuffle (shared with [[TextAnalysis.tfIdfTopTerm]]'s tf
  *     frame shape). Persisted under the `storage` knob — it feeds
  *     doc lengths, document frequencies, and the scoring join.
  *  2. doc lengths / corpus stats: keyed aggregation off the postings,
  *     with the (N, Σdl) pair attached downstream as a ONE-ROW
  *     broadcast product (|rows| × O(1) — the same constant-side
  *     exemption class as t12's corpus count).
  *  3. scoring: postings filtered to the query vocabulary (a
  *     broadcast-side sliver — query terms are O(10)), joined to the
  *     broadcast term list and per-term document frequencies, then
  *     summed per (query, doc) with per-term scores rounded to 6 dp
  *     and accumulated as DECIMAL(28,12), so the result is
  *     order-independent and engine-reproducible.
  *  4. top-k: the bounded-heap [[TopKPairs]] aggregate — k rows per
  *     (query, mapper) cross the wire, never a global sort (the same
  *     posture as `Knn.rankTopK`).
  *
  * At 100 TB the postings/doc-length frames become persisted bucketed
  * tables (the `sources.BucketedStore` protocol the dedup band index
  * and ANN index already use) and step 1 drops out of the query path;
  * steps 3-4 touch only query-vocabulary postings either way.
  *
  * Ranking ties break on doc_id asc; docs with no tokens have no
  * postings and cannot score. Reference behavior: lexical search over
  * curated text is the retrieval leg next to fabric-claims'
  * semantic-model measures (DirectLake tables feed both).
  */
object Search {

  /** Top-k BM25 hits per keyword query.
    *
    * @param queries (query_id, distinct query terms); terms are
    *                matched against [[TextAnalysis.tokens]] output
    * @return (query_id, rank, doc_id, score), rank 1..k by
    *         (score desc, doc_id asc)
    */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               queries: Seq[(String, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               storage: StorageLevel = graft.Caching.Default): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bm25(docs, id, text,
      queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
        .toDF("query_id", "token"),
      k, k1, b, storage)
  }

  /** BM25 where each query is itself a document ("more like this"):
    * the query's distinct tokens are its terms. Same contract as
    * [[bm25TopK]] with query_id typed by `qid`. The query side is
    * assumed small (a probe batch) and broadcasts; corpus-side work
    * is identical to [[bm25TopK]]. */
  def bm25MoreLikeThis(corpus: DataFrame, id: Column, text: Column,
                       queryDocs: DataFrame, qid: Column, qtext: Column,
                       k: Int, k1: Double = 1.2, b: Double = 0.75,
                       storage: StorageLevel = graft.Caching.Default): DataFrame =
    bm25(corpus, id, text,
      queryDocs.select(qid.as("query_id"),
        explode(array_distinct(TextAnalysis.tokens(qtext))).as("token")),
      k, k1, b, storage)

  /** (doc_id, token, tf) postings of a corpus — the inverted index's
    * data plane and the shared head of every BM25 path. */
  private def buildPostings(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))

  private def docLengths(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id").agg(sum(col("tf")).as("dl"))

  /** Shared BM25 core over a (query_id, token) term frame — query_id
    * keeps whatever type the caller gives it. `qterms` must be
    * distinct per (query, token) and small enough to broadcast.
    *
    * One-shot scale shape: the corpus is never aggregated corpus-wide
    * — doc lengths are map-only (`size(tokens)`), the one-row corpus
    * stats partial-aggregate off that, and the ONLY shuffle is the
    * query-vocabulary posting sliver (the filter sits right on the
    * explode, inside codegen, and `dl` rides the grouping key so no
    * doc-length join exists). Docs with no tokens drop out, matching
    * the postings-derived formulation. */
  private def bm25(docs: DataFrame, id: Column, text: Column,
                   qterms: DataFrame, k: Int, k1: Double, b: Double,
                   storage: StorageLevel): DataFrame = {
    val qtok = broadcast(qterms.select("token").distinct())
    val base = docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("tks"))
      .withColumn("dl", size(col("tks")).cast("long"))
      .where(col("dl") > 0)
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tfq = graft.Caching.persisted(
      base.select(col("doc_id"), col("dl"), explode(col("tks")).as("token"))
        .join(qtok, "token")
        .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf")),
      storage)
    val dfq = tfq.groupBy("token").agg(count(lit(1)).as("dfn"))
    scoreAndRank(tfq, dfq, stats, qterms, k, k1, b)
  }

  /** The scoring tail every path shares: per-term BM25 (float-op order
    * mirrored verbatim by the SQL oracles: idf and the per-term score
    * each round to 6 dp), decimal-exact per-doc sum, bounded-heap
    * top-k. `tfq` = (doc_id, dl, token, tf) postings restricted to the
    * query vocabulary WITH the doc length already attached; `dfq` =
    * (token, dfn) for that vocabulary. */
  private def scoreAndRank(tfq: DataFrame, dfq: DataFrame,
                           stats: DataFrame, qterms: DataFrame, k: Int,
                           k1: Double, b: Double): DataFrame =
    rankScored(tfq.join(broadcast(qterms), "token"), dfq, stats, k, k1, b)

  /** [[scoreAndRank]] for a sliver ALREADY keyed by query_id —
    * the filtered probe's entry point (its per-query admission filter
    * must survive into scoring, so re-joining terms by token alone
    * would re-admit rows another query filtered out). */
  private def rankScored(withQ: DataFrame, dfq: DataFrame,
                         stats: DataFrame, k: Int,
                         k1: Double, b: Double): DataFrame = {
    val scored = withQ
      .join(broadcast(dfq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast(DoubleType) / col("n_docs").cast(DoubleType))
      .withColumn("idf", round(log(
        (col("n_docs").cast(DoubleType) - col("dfn").cast(DoubleType) + 0.5)
          / (col("dfn").cast(DoubleType) + 0.5) + 1.0), 6))
      // §6 quantizer on the per-term product and the per-doc sum's
      // final round (the inner 6-dp idf round pins the transcendental
      // log — unchanged): engine-identical at the half boundary
      .withColumn("term_score", graft.functions.Quantize.qdp(col("idf") *
        ((col("tf").cast(DoubleType) * (lit(k1) + 1.0)) /
          (col("tf").cast(DoubleType) +
            lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * (col("dl").cast(DoubleType) / col("avgdl"))))), 6))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(graft.functions.Quantize.qdp(
        sum(col("term_score").cast(DecimalType(28, 12)))
          .cast(DoubleType), 6).as("score"))
    perDoc.groupBy("query_id")
      .agg(ColumnBridge.column(TopKPairs(
        ColumnBridge.expression(struct(col("score"), col("doc_id").cast("long"))), k)
        .toAggregateExpression()).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.sim").as("score"))
  }

  // --- persisted inverted index ---------------------------------------

  import org.apache.spark.sql.SparkSession
  import graft.sources.BucketedStore

  private val IndexTables =
    Seq("postings", "doclen", "termstats", "stats", "meta")

  /** The committed current version of index `name`. */
  def indexVersion(spark: SparkSession, name: String): Option[Int] =
    BucketedStore.currentVersion(spark, name)

  /** Drop every catalog object and on-disk remnant of index `name`. */
  def dropIndex(spark: SparkSession, name: String): Unit =
    BucketedStore.drop(spark, name, IndexTables)

  private def commitIndex(spark: SparkSession, name: String,
                          postings: DataFrame, dl: DataFrame,
                          termstats: DataFrame, stats: DataFrame,
                          buckets: Int,
                          meta: Option[DataFrame] = None): Int =
    BucketedStore.commit(spark, name, Seq(
      BucketedStore.Member("postings", postings, Seq("doc_id")),
      BucketedStore.Member("doclen", dl, Seq("doc_id")),
      BucketedStore.Member("termstats", termstats, Seq("token")),
      BucketedStore.Member("stats", stats)) ++
      meta.map(m => BucketedStore.Member("meta", m, Seq("doc_id"))),
      buckets)

  /** Whether version `v` of index `name` carries the optional metadata
    * member (written by [[writeIndex]]'s `metaCols`). */
  private def hasMeta(spark: SparkSession, name: String, v: Int): Boolean =
    spark.catalog.tableExists(s"${name}_meta_v$v")

  /** Build and commit a persisted BM25 inverted index over `docs` —
    * the production search-service shape of [[bm25TopK]], on the same
    * [[BucketedStore]] protocol as the ANN and dedup indexes (ONE
    * atomic ptr view; probes pin a version first). Members:
    *
    *  - `postings` (doc_id, token, tf) and `doclen` (doc_id, dl),
    *    both bucketed by doc_id — [[probeIndex]]'s scoring join plans
    *    NO exchange on either corpus-sized side
    *  - `termstats` (token, dfn) — document frequencies precomputed
    *    at build, bucketed by token; a probe touches only the query
    *    vocabulary's rows
    *  - `stats` — the one-row (n_docs, sum_dl) pair
    *
    * Returns the committed version. */
  def writeIndex(docs: DataFrame, id: Column, text: Column, name: String,
                 buckets: Int = 32,
                 storage: StorageLevel = graft.Caching.Default,
                 metaCols: Seq[String] = Nil): Int = {
    val spark = docs.sparkSession
    val postings = graft.Caching.persisted(
      buildPostings(docs, id, text), storage)
    val dl = docLengths(postings)
    commitIndex(spark, name, postings, dl,
      postings.groupBy("token").agg(count(lit(1)).as("dfn")),
      dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")),
      buckets,
      if (metaCols.isEmpty) None
      else Some(docs.select((id.as("doc_id") +: metaCols.map(col)): _*)))
  }

  /** Upsert a document batch into index `name` with EXACT stats
    * maintenance — unlike the ANN index's frozen-quantizer contract,
    * BM25's idf/avgdl can be kept exact in O(batch + vocab): the old
    * postings of re-ingested doc ids are subtracted from the term and
    * corpus stats before the new ones are added, so a probe after any
    * update sequence scores identically to a fresh [[writeIndex]] of
    * the final corpus (spec-asserted). Deleted-then-absent tokens drop
    * out at dfn 0. One index rewrite pass; returns the new version. */
  def updateIndex(incoming: DataFrame, id: Column, text: Column,
                  name: String, buckets: Int = 32,
                  storage: StorageLevel = graft.Caching.Default): Int = {
    val spark = incoming.sparkSession
    val v = indexVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no BM25 index named $name"))
    def tab(t: String) = BucketedStore.table(spark, name, t, v)
    val pNew = graft.Caching.persisted(
      buildPostings(incoming, id, text), storage)
    val dlNew = docLengths(pNew)
    // the re-ingested id set comes from the INCOMING frame, not the new
    // postings: a doc re-ingested with token-less text produces no
    // postings rows, but its old contributions still have to go
    val ids = incoming.select(id.as("doc_id")).distinct()
    // old contributions of the re-ingested ids (bucketed scans; the
    // id set is a probe batch — broadcast-joinable)
    val pOld = graft.Caching.persisted(
      tab("postings").join(broadcast(ids), "doc_id"), storage)
    val dlOld = tab("doclen").join(broadcast(ids), "doc_id")
    val postings = tab("postings").join(broadcast(ids), Seq("doc_id"), "left_anti")
      .unionAll(pNew)
    val dl = tab("doclen").join(broadcast(ids), Seq("doc_id"), "left_anti")
      .unionAll(dlNew)
    // old and new contributions aggregate in ONE pass each (a signed
    // union replaces the former per-side agg + full_outer-join chain:
    // dfn − d_old + d_new ≡ dfn + Σ(±1), exact integer arithmetic) —
    // one aggregation job and one join instead of two of each
    val dfDelta = pOld.select(col("token"), lit(-1L).as("d"))
      .unionAll(pNew.select(col("token"), lit(1L).as("d")))
      .groupBy("token").agg(sum(col("d")).as("d"))
    val termstats = tab("termstats")
      .join(dfDelta, Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("dfn"), lit(0L)) + coalesce(col("d"), lit(0L))).as("dfn"))
      .filter(col("dfn") > 0)
    // same signed-union collapse for the one-row corpus stats:
    // (n − o_n + n_n, Σdl − o_s + n_s) ≡ (n, Σdl) + Σ(±1, ±dl)
    val deltas = dlOld.select(lit(-1L).as("sgn"), col("dl"))
      .unionAll(dlNew.select(lit(1L).as("sgn"), col("dl")))
      .agg(sum(col("sgn")).as("d_n"), sum(col("sgn") * col("dl")).as("d_s"))
    val stats = tab("stats").crossJoin(broadcast(deltas))
      .select(
        (col("n_docs") + coalesce(col("d_n"), lit(0L))).as("n_docs"),
        (col("sum_dl") + coalesce(col("d_s"), lit(0L))).as("sum_dl"))
    // an index written with metaCols keeps its metadata current: the
    // incoming batch must carry the same columns (fail-fast select)
    val meta =
      if (!hasMeta(spark, name, v)) None
      else {
        val stored = tab("meta")
        Some(graft.operators.Merge.upsert(stored,
          incoming.select((id.as("doc_id") +:
            stored.columns.filter(_ != "doc_id").toIndexedSeq.map(col)): _*),
          Seq("doc_id")))
      }
    commitIndex(spark, name, postings, dl, termstats, stats, buckets, meta)
  }

  /** Remove a document id set from index `name` — the lifecycle leg a
    * GDPR erasure / takedown / recrawl-tombstone flow needs, with the
    * same EXACT stats maintenance as [[updateIndex]] (it is
    * [[updateIndex]] with an empty incoming batch): the deleted ids'
    * postings leave `postings`/`doclen` by one anti-join each, their
    * document-frequency contributions subtract out of `termstats`
    * (tokens now in no document drop at dfn 0), and the one-row corpus
    * stats shed their (count, Σdl). A probe after any
    * write/update/delete sequence therefore scores identically to a
    * fresh [[writeIndex]] of the surviving corpus (spec-asserted).
    * Ids absent from the index are no-ops. `ids`' first column is the
    * doc id; a delete set is takedown-request-sized — broadcast.
    * One index rewrite pass; returns the new committed version. */
  def deleteFromIndex(ids: DataFrame, name: String, buckets: Int = 32,
                      storage: StorageLevel = graft.Caching.Default): Int = {
    val spark = ids.sparkSession
    val v = indexVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no BM25 index named $name"))
    def tab(t: String) = BucketedStore.table(spark, name, t, v)
    val del = ids.select(col(ids.columns.head).as("doc_id")).distinct()
    val pOld = graft.Caching.persisted(
      tab("postings").join(broadcast(del), "doc_id"), storage)
    val dlOld = tab("doclen").join(broadcast(del), "doc_id")
    val termstats = tab("termstats")
      .join(pOld.groupBy("token").agg(count(lit(1)).as("d_old")),
        Seq("token"), "left_outer")
      .select(col("token"),
        (col("dfn") - coalesce(col("d_old"), lit(0L))).as("dfn"))
      .filter(col("dfn") > 0)
    val deltas = dlOld.agg(count(lit(1)).as("o_n"), sum(col("dl")).as("o_s"))
    // the new one-row stats are computed ONCE (this action) and
    // committed as a literal row — the former shape ran the guard
    // action over the full delta chain and then RE-RAN that chain as
    // the stats member's write job
    val statsRow = tab("stats").crossJoin(broadcast(deltas))
      .select((col("n_docs") - col("o_n")).as("n_docs"),
        (col("sum_dl") - coalesce(col("o_s"), lit(0L))).as("sum_dl"))
      .head()
    // empty-index boundary: deleting the FULL corpus would commit
    // n_docs=0 and a later probe's avgdl = sum_dl/n_docs would go
    // NULL instead of matching a fresh build of the (empty) survivor
    // set — that lifecycle end is dropIndex's job, so refuse here.
    // One one-row job over delete-set-sized inputs; takedown batches
    // are tiny, so the extra action is noise.
    require(statsRow.getLong(0) > 0,
      s"deleteFromIndex would empty BM25 index '$name'; use dropIndex")
    import spark.implicits._
    val stats = Seq((statsRow.getLong(0), statsRow.getLong(1)))
      .toDF("n_docs", "sum_dl")
    commitIndex(spark, name,
      tab("postings").join(broadcast(del), Seq("doc_id"), "left_anti"),
      tab("doclen").join(broadcast(del), Seq("doc_id"), "left_anti"),
      termstats, stats, buckets,
      if (hasMeta(spark, name, v))
        Some(tab("meta").join(broadcast(del), Seq("doc_id"), "left_anti"))
      else None)
  }

  /** Keyword top-k against the current committed index version — same
    * output as [[bm25TopK]] over the indexed corpus, but the postings
    * build, doc lengths, and document frequencies are all bucketed
    * index scans: the only per-probe corpus-sized work is the
    * exchange-free postings⋈doclen scoring join over the query-
    * vocabulary sliver. */
  def probeIndex(spark: SparkSession, name: String,
                 queries: Seq[(String, Seq[String])], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    probeIndexTerms(spark, name,
      queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
        .toDF("query_id", "token"),
      k, k1, b)
  }

  /** [[probeIndex]] with the query terms as a (query_id, token) frame
    * (distinct per query; a probe batch — broadcast-sized). The form
    * streaming probes use. */
  def probeIndexTerms(spark: SparkSession, name: String, qterms: DataFrame,
                      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // pin ONE version up front — never a torn snapshot mid-commit
    val v = indexVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no BM25 index named $name"))
    def tab(t: String) = BucketedStore.table(spark, name, t, v)
    val qtok = broadcast(qterms.select("token").distinct())
    // the doc-length attach is the bucketed-bucketed doc_id join —
    // exchange-free on both corpus-sized sides (spec-asserted)
    scoreAndRank(
      tab("postings").join(qtok, "token").join(tab("doclen"), "doc_id"),
      tab("termstats").join(qtok, "token"),
      tab("stats"), qterms, k, k1, b)
  }

  /** [[probeIndex]] restricted per query to documents sharing the
    * query's `filterKeys` metadata — field-filtered keyword search
    * (the "lang:en" / "site:…" clause), the lexical twin of
    * [[graft.ann.AnnIndex.topKFiltered]]. The index must have been
    * written with `metaCols` covering `filterKeys`; `queries` rows
    * are (query_id, terms Seq, <filterKeys values>).
    *
    * Contract (the Lucene/Elasticsearch filter-clause semantics):
    * corpus stats (idf, avgdl) stay GLOBAL — the filter gates which
    * documents may MATCH, it does not re-estimate the model on the
    * subcorpus — so a document's score for a query is identical with
    * or without the filter, and the filter only removes rows. The
    * admission join lands on the query-vocabulary scoring sliver
    * BEFORE ranking (bucketed meta on doc_id — exchange-free on the
    * corpus side), so the top-k never underfills by post-filtering. */
  def probeIndexFiltered(spark: SparkSession, name: String,
                         queries: DataFrame, filterKeys: Seq[String], k: Int,
                         k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(filterKeys.nonEmpty, "probeIndexFiltered needs a filter key")
    val v = indexVersion(spark, name).getOrElse(
      throw new IllegalStateException(s"no BM25 index named $name"))
    require(hasMeta(spark, name, v),
      s"BM25 index $name has no metadata member; write it with metaCols")
    def tab(t: String) = BucketedStore.table(spark, name, t, v)
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(col("terms"))).as("token"))
    val qtok = broadcast(qterms.select("token").distinct())
    val qfilter = broadcast(queries.select(col("query_id") +:
      filterKeys.map(fk => col(fk).as(s"__q_$fk")): _*))
    // admission BEFORE scoring: the sliver joins bucketed meta on
    // doc_id, attaches each query (term match), then keeps only rows
    // matching that query's admitted values (inner equality — NULL
    // metadata never matches). The result stays keyed by query_id
    // through scoring: re-joining by token alone would re-admit rows
    // another query filtered out.
    val withQ = filterKeys.foldLeft(
      tab("postings").join(qtok, "token").join(tab("doclen"), "doc_id")
        .join(tab("meta"), "doc_id")
        .join(broadcast(qterms), "token")
        .join(qfilter, "query_id")) {
      (df, fk) => df.filter(col(fk) === col(s"__q_$fk"))
    }.select("query_id", "doc_id", "dl", "token", "tf")
    rankScored(withQ, tab("termstats").join(qtok, "token"),
      tab("stats"), k, k1, b)
  }

  /** Search-results diversification by group collapsing — the SERP
    * host-collapse move (at most `perGroup` hits per (query, group) in
    * the final list, e.g. "no more than 2 results per domain"): rank
    * survivors keep their relative order, then the list re-ranks and
    * cuts to `k`. Both windows are PARTITIONED rn<=k filters — the
    * WindowTopOneRewrite bounded-heap path — and the input is already
    * a top-N list (|Q|×N rows), so this is list-sized work start to
    * finish; nothing corpus-sized is touched.
    *
    * `hits` must carry (query_id, rank, ...) and must NOT already
    * have a `grp` column (the collapse key rides into the output as
    * `grp`, and `withColumn` would silently clobber a pre-existing
    * one — asserted). Working columns use collision-proof internal
    * names, so any other caller column passes through untouched. */
  def diversifyTopK(hits: DataFrame, group: Column, k: Int,
                    perGroup: Int): DataFrame = {
    require(k > 0 && perGroup > 0, "k and perGroup must be positive")
    require(!hits.columns.contains("grp"),
      "diversifyTopK writes the collapse key as 'grp'; input already has one")
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("query_id"), col("grp"))
      .orderBy(col("rank"))
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    hits.withColumn("grp", group)
      .withColumn("__dv_srn", row_number().over(w1))
      .filter(col("__dv_srn") <= perGroup)
      .withColumn("__dv_rank", row_number().over(w2))
      .filter(col("__dv_rank") <= k)
      .drop("__dv_srn", "rank")
      .withColumnRenamed("__dv_rank", "rank")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttner 2009): fuse
    * ranked lists from heterogeneous retrievers (e.g. a BM25 lexical
    * leg and an ANN vector leg) without score calibration —
    * `rrf(d) = Σ_legs 1/(kRrf + rank_leg(d))`. The standard hybrid-
    * search combiner (kRrf = 60 per the paper).
    *
    * Each leg is a (query_id, rank, doc_id) frame (extra columns
    * ignored). Per-leg terms round to 9 dp and sum as DECIMAL so the
    * fused score is partition-order-independent and engine-
    * reproducible; final ranking ties break on doc_id asc. Legs are
    * top-k lists (tiny relative to the corpus), so fusion costs one
    * keyed aggregation over |Q| × k × legs rows. */
  /** Score-based linear hybrid fusion — the normalized
    * convex-combination alternative to [[rrfFuse]] (the "hybrid α"
    * every vector store exposes next to RRF): per (query, leg), scores
    * min-max normalize over that leg's OWN top-k list to [0,1] (a
    * constant list normalizes to 1.0 — it only says "these matched"),
    * then fused = α·vec + (1−α)·lex, a doc absent from a leg
    * contributing 0 from it. Unlike RRF this preserves score SHAPE —
    * a runaway-best vector hit stays runaway-best — at the cost of
    * needing the per-leg normalization RRF exists to avoid.
    *
    * Determinism (e14's lesson): the legs' scores are 6-dp-grid
    * values, so re-rounding their combination lands exactly on
    * decimal half-way points where engines' round() differ by an ulp
    * — the fused score is therefore emitted RAW; the normalization
    * and combination are one fixed IEEE sequence over engine-equal
    * inputs, bit-identical everywhere.
    *
    * Both inputs are |Q|×k frames (query_id, doc_id, score);
    * everything here is list-sized: two per-query min/max aggs, one
    * full-outer equi-join, one bounded-heap top-k.
    *
    * Local-bench crossover note: fed from the persisted indexes
    * (e15b) this can bench slower than the brute legs (e15) at toy
    * corpus sizes — probe overhead dominates below ~sf1 while the
    * brute legs are still cheap. SCALING.md shows probe latency flat
    * in corpus size and brute growing linearly; the indexed
    * composition is the production path. */
  def linearFuse(vec: DataFrame, lex: DataFrame, k: Int,
                 alpha: Double = 0.5): DataFrame = {
    require(k >= 1, s"invalid k=$k")
    require(alpha >= 0.0 && alpha <= 1.0, s"invalid alpha=$alpha")
    def norm(leg: DataFrame, out: String): DataFrame = {
      // per-query min/max attach as a WINDOW over the leg, not a
      // groupBy + join-back: each leg is an EXPENSIVE retrieval
      // subtree (brute kNN / full BM25) and a self-join re-executes
      // it twice (branch pruning defeats ReuseExchange); the leg is
      // query×k-sized, so the window shuffle is tiny, and min/max are
      // exact (order-independent) so the oracle is unaffected
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      leg.withColumn("mn", min(col("score")).over(w))
        .withColumn("mx", max(col("score")).over(w))
        .withColumn(out, when(col("mx") === col("mn"), lit(1.0))
          .otherwise((col("score") - col("mn")) / (col("mx") - col("mn"))))
        .select(col("query_id"), col("doc_id"), col(out))
    }
    val fused = norm(vec.select(col("query_id"), col("doc_id"), col("score")), "nv")
      .join(norm(lex.select(col("query_id"), col("doc_id"), col("score")), "nl"),
        Seq("query_id", "doc_id"), "full_outer")
      .withColumn("fused", lit(alpha) * coalesce(col("nv"), lit(0.0)) +
        lit(1.0 - alpha) * coalesce(col("nl"), lit(0.0)))
    fused.groupBy("query_id")
      .agg(ColumnBridge.column(TopKPairs(
        ColumnBridge.expression(struct(col("fused"), col("doc_id").cast("long"))), k)
        .toAggregateExpression()).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.sim").as("fused_score"))
  }

  def rrfFuse(legs: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    val u = legs.map(_.select(col("query_id"), col("rank"), col("doc_id")))
      .reduce(_ unionAll _)
    val fused = u
      // §9/§6 quantizers on the reciprocal-rank quotient and the
      // final sum (Quantize scaladoc): engine-identical at the half
      // boundary, unlike round(double, n)
      .withColumn("term",
        graft.functions.Quantize.qdp(
          lit(1.0) / (lit(kRrf) + col("rank")).cast(DoubleType), 9))
      .groupBy("query_id", "doc_id")
      .agg(graft.functions.Quantize.qdp(
        sum(col("term").cast(DecimalType(28, 12)))
          .cast(DoubleType), 6).as("rrf_score"))
    fused.groupBy("query_id")
      .agg(ColumnBridge.column(TopKPairs(
        ColumnBridge.expression(struct(col("rrf_score"), col("doc_id").cast("long"))), k)
        .toAggregateExpression()).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.sim").as("rrf_score"))
  }
}
