package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over the near-dup
  * pair graph, so transitive duplicates (a≈b, b≈c but a≉c) resolve to
  * ONE cluster with one deterministic keeper — the web-scale refinement
  * of the greedy per-pair drop in `d6_dedup_apply`.
  *
  * Algorithm: iterative min-label propagation with pointer jumping —
  * every node adopts the minimum label in its closed neighborhood,
  * then additionally adopts its LABEL's label (path halving). The
  * jump compresses label chains geometrically, so rounds needed are
  * O(log diameter) rather than O(diameter) — a 1000-doc templated
  * near-dup chain resolves in ~10 rounds, not 1000 (the round
  * compression of Rastogi et al. 2013 "Finding Connected Components
  * in Map-Reduce in Logarithmic Rounds" / Kiveris et al. 2014
  * "Connected Components in MapReduce and Beyond").
  *
  * Scale: each round is two keyed shuffles (edge join + min-agg, then
  * the label-of-label join on the node-sized label frame). Frames are
  * `localCheckpoint()`ed each round so lineage doesn't double per
  * iteration (swap for `checkpoint()` + a checkpoint dir on a real
  * cluster). The convergence probe is a scalar count — no data ever
  * collects to the driver.
  */
object DupClusters {

  /** Connected components of the (doc_a, doc_b) pair graph.
    * Returns (doc_id, cluster_id) — cluster_id = the component's
    * minimum doc_id — for every doc that appears in `pairs`. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] plus the number of propagation rounds it
    * took to converge — the observable behind the O(log diameter)
    * claim in the scaladoc above, measured (not argued) by the scaling
    * experiment on chain-shaped graphs (SCALING.md: rounds grow with
    * log(chain length), NOT with corpus size at fixed chain length). */
  def connectedComponentsWithRounds(pairs: DataFrame,
                                    maxIter: Int = 25): (DataFrame, Int) = {
    // reject id columns whose cast("long") could silently null or
    // truncate (the propagation join would never converge on nulls);
    // integer-valued decimals cast exactly and are allowed
    Seq("doc_a", "doc_b").foreach { c =>
      import org.apache.spark.sql.types._
      val field = pairs.schema.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"pairs needs a $c column"))
      val ok = field.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType => d.scale == 0 && d.precision <= 18
        case _ => false
      }
      require(ok, s"connectedComponents needs integral doc ids, " +
        s"$c is ${field.dataType.sql}")
    }
    val edges = pairs.select(
      col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    // Convergence probe: labels are MONOTONE NON-INCREASING (each
    // round takes min over node ids), so "no label changed" ⟺ "the
    // label sum is unchanged" — one exact-decimal aggregate over the
    // just-checkpointed frame instead of the previous join-with-
    // previous-round + filter + count (a whole extra shuffle join per
    // round; with ~3 driver actions per round the loop was action-
    // bound on small graphs and paid an extra node-sized join at any
    // scale).
    def lblSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast(
        org.apache.spark.sql.types.DecimalType(38, 0)))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty graph: converge at once
    var prevSum = lblSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // propagate: every node offers its label to its neighbors; the
      // union with the node's own label keeps labels monotone non-
      // increasing, so the sum probe detects every change
      val prop = sym.join(labels, sym("src") === labels("node"))
        .select(sym("dst").as("node"), labels("lbl"))
      // NOT checkpointed: the jump self-join reads it from two
      // branches, but both share the same canonical aggregation
      // subtree, so ReuseExchange dedups the shuffle — the second
      // branch only re-runs the reduce-side aggregation over the
      // label-sized frame, cheaper than a full materialization action
      // per round (measured: one fewer job per round, same results)
      val combined = labels.union(prop)
        .groupBy("node").agg(min("lbl").as("lbl"))
      // pointer jump (path halving): adopt my label's label. Labels
      // are always node ids (they start as the node itself and only
      // ever take min over node ids), so the lookup is an equi-join of
      // the label frame with itself; lbl(node) <= node monotonically,
      // so the looked-up label can only be smaller.
      val jump = combined.select(col("node").as("jnode"), col("lbl").as("jlbl"))
      val next = combined.join(jump, col("lbl") === col("jnode"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("jlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val newSum = lblSum(next)
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    (labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id")), i)
  }

  /** Incremental component maintenance — the O(batch) leg of
    * [[connectedComponents]] for the nightly-append shape
    * (`d8_incremental_dedup` generates the batch's pairs in O(batch);
    * this folds them into stored assignments without recomputing the
    * corpus): contract each new edge through the stored labels
    * (endpoint → its stored cluster_id, or itself if unseen), run the
    * pointer-jumping propagation on the CONTRACTED graph — whose node
    * set is only the touched clusters plus the batch's new docs, never
    * corpus-sized — then relabel exactly the touched components via
    * one equi-join on cluster_id and pass every untouched row through
    * unchanged.
    *
    * Correctness: contracting a component to its representative
    * preserves connectivity, and because a stored cluster_id IS its
    * component's minimum doc_id, the contracted graph's min-label
    * roots equal the merged components' global minima — so the result
    * is bit-identical to a one-shot [[connectedComponents]] over the
    * full accumulated pair set (spec-asserted, and the d19 oracle
    * recomputes exactly that).
    *
    * Scale: the iterative part runs on the contracted graph
    * (O(batch edges) nodes), so propagation cost is flat in corpus
    * size (measured, SCALING.md); the only corpus-sized stages are
    * the two label lookups (equi-joins on doc_id) and the final
    * relabel (one equi-join on cluster_id + coalesce) — single keyed
    * shuffles with no iteration. Returns (doc_id, cluster_id) covering
    * the stored docs plus every batch-pair endpoint. */
  def mergeComponents(stored: DataFrame, pairs: DataFrame,
                      maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(
      col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
    val lbl = stored.select(
      col("doc_id").cast("long").as("node"), col("cluster_id").cast("long").as("lbl"))
    // contract: each endpoint maps to its stored component representative
    val contracted = edges
      .join(lbl.select(col("node").as("src"), col("lbl").as("slbl")),
        Seq("src"), "left")
      .join(lbl.select(col("node").as("dst"), col("lbl").as("dlbl")),
        Seq("dst"), "left")
      .select(coalesce(col("slbl"), col("src")).as("doc_a"),
        coalesce(col("dlbl"), col("dst")).as("doc_b"))
      // edges inside one stored component contract to self-loops —
      // nothing to merge
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    // components of the contracted graph: node = old cluster id or new
    // doc id, root = merged component's global minimum
    val remap = connectedComponents(contracted, maxIter)
      .select(col("doc_id").as("cnode"), col("cluster_id").as("root"))
    // relabel ONLY the touched components; untouched rows coalesce
    // through unchanged
    val updated = stored
      .join(remap, stored("cluster_id") === remap("cnode"), "left")
      .select(stored("doc_id").cast("long").as("doc_id"),
        coalesce(col("root"), stored("cluster_id").cast("long")).as("cluster_id"))
    // batch-pair endpoints the store has never seen: their contracted
    // node is themselves; endpoints whose every edge contracted away
    // (both ends already same-cluster members) keep that cluster's id
    val newDocs = edges.select(col("src").as("doc_id"))
      .union(edges.select(col("dst").as("doc_id")))
      .distinct()
      .join(lbl.select(col("node").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .filter(col("lbl").isNull)
      .join(remap, col("doc_id") === remap("cnode"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
    updated.union(newDocs)
  }

  /** Cluster-aware dedup apply: survivors = docs that are their
    * cluster's minimum id, plus every doc with no near-dup at all. */
  def survivors(docs: DataFrame, idName: String, pairs: DataFrame): DataFrame = {
    val drops = connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idName))
    docs.join(drops, Seq(idName), "left_anti")
  }

  /** Duplication profile of a corpus — the report a curation run reads
    * BEFORE deciding drop-vs-downweight: per duplicate-cluster size,
    * how many clusters have that size and how many docs they hold
    * (singletons are not in `clusters` and so not in the histogram —
    * the histogram describes the duplicated mass). Two partial-
    * aggregating keyed counts over the clusters frame; output is
    * distinct-sizes-sized. */
  def clusterSizeHistogram(clusters: DataFrame): DataFrame =
    clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  /** SOFT dedup — the downweight alternative to [[survivors]]' hard
    * drop (the mixture-building move: duplicated content still trains,
    * but each cluster contributes ONE doc's worth of expected mass):
    * every doc gets weight 1/|its cluster| (singletons weight 1.0,
    * cluster_id = own id), ready to feed `Sampling.mix`-style
    * per-stratum recipes or a weighted sampler. One keyed count over
    * the clusters frame + one left equi-join against the corpus ids —
    * nothing corpus-quadratic, weights are single IEEE divisions. */
  def dedupWeights(docs: DataFrame, idName: String,
                   clusters: DataFrame): DataFrame = {
    val sz = clusters.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
    val cl = clusters.join(sz, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("sz"))
    docs.select(col(idName).as("doc_id"))
      .join(cl, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        (lit(1.0) / coalesce(col("sz"), lit(1L))).as("weight"))
  }

  /** Quality-based keeper selection — the "keep the BEST copy" policy
    * real curation runs use where `d6`'s keep-lowest-id is arbitrary
    * (near-dup clusters routinely hold one full article and N
    * truncated/boilerplate-wrapped copies; Lee et al. 2021 keep one
    * member per cluster — WHICH member is a quality call): per
    * cluster, the keeper is the member maximizing (quality, then
    * lowest id as the deterministic tiebreak). One equi-join of the
    * clusters frame against the per-doc quality column + one
    * partial-aggregating `max_by` over a total-ordering struct — the
    * winner-per-key posture (no per-cluster sort, no window). Output:
    * (cluster_id, n_members, keeper_id, keeper_quality) with
    * `keeper_quality` in the quality column's NATIVE type — a cast
    * here would silently truncate fractional qualities (a [0,1]
    * quality score cast to long is 0 for every doc, degrading "keep
    * the best copy" to keep-lowest-id); struct ordering ranks any
    * orderable type as-is (doubles order NaN greatest, Spark's
    * standard sort order). */
  def bestKeepers(clusters: DataFrame, docs: DataFrame,
                  id: Column, quality: Column): DataFrame =
    clusters
      .join(docs.select(id.as("doc_id"), quality.as("q")),
        "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max_by(col("doc_id"), struct(col("q"), -col("doc_id")))
          .as("keeper_id"),
        max(col("q")).as("keeper_quality"))
}
