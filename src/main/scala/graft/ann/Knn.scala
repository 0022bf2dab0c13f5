package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{TopKPairs, Vectors}

/** Similarity search over an embedding column (`array<float>`).
  *
  * - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *   query set, one pass over the candidate corpus, per-query top-k.
  *   At 100 TB the corpus side stays partition-parallel; the only
  *   wide op is the final per-query top-k (tiny: queries x k rows).
  * - [[lshTopK]] is the scale path: random-hyperplane LSH buckets both
  *   sides so each query only scores its bucket — candidate cost drops
  *   from |corpus| to |bucket|, at recall < 1.
  * - [[embeddingNearDupPairs]] is cosine near-dup detection (the
  *   embedding leg of the dedup family).
  */
object Knn {

  /** Bounded top-k aggregate of struct(sim, id) per group — see
    * [[graft.functions.TopKPairs]]. Unlike row_number().over(window),
    * this partial-aggregates: each map partition ships at most k
    * candidates per group into the shuffle instead of every row. */
  private def topKAgg(sim: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKPairs(
      ColumnBridge.expression(struct(sim, id.cast("long"))), k)
      .toAggregateExpression())

  /** Rank the per-query top-k of scored (query_id, neighbor_id, sim)
    * rows: sim desc, neighbor_id asc — identical output to the window
    * row_number form (unique ids make the order total). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(topKAgg(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"), col("col.sim").as("sim"))

  /** Exact top-k by cosine: returns (query_id, rank, neighbor_id, sim)
    * with sim rounded to 6 dp and rank ordered by (sim desc, id) so the
    * result is engine-reproducible. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Norms computed once per row before the join; per-pair work is a
    // single codegen'd dot product. Same float ops as cosine() — the
    // divisor is the identical sqrt(dot) values — so results match.
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      Vectors.asDouble(col("embedding")).as("qe"))
      .withColumn("qn", Vectors.norm(col("qe"))))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      Vectors.asDouble(col("embedding")).as("ce"))
      .withColumn("cn", Vectors.norm(col("ce")))
    val scored = q.join(c)
      .withColumn("sim",
        round(Vectors.dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    rankTopK(scored.select("query_id", "neighbor_id", "sim"), k)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim) —
    * small integers so dot products stay exact. */
  private def planeWeight(p: Int, d: Column): Column =
    (lit(p * 31L) + d * 17L) % 7L - 3L

  /** Sign-bucket of a vector under `planes` hyperplanes: a bit string
    * like "0110...". Map-only. */
  def lshBucket(vec: Column, planes: Int): Column =
    concat_ws("", (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * planeWeight(p, d).cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Approximate top-k: bucket queries and corpus with [[lshBucket]],
    * join per bucket, per-query top-k within the matched candidates. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 6): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      Vectors.asDouble(col("embedding")).as("qe"))
      .withColumn("bucket", lshBucket(col("qe"), planes))
      .withColumn("qn", Vectors.norm(col("qe")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      Vectors.asDouble(col("embedding")).as("ce"))
      .withColumn("bucket", lshBucket(col("ce"), planes))
      .withColumn("cn", Vectors.norm(col("ce")))
    val scored = q.join(c, "bucket")
      .withColumn("sim",
        round(Vectors.dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    rankTopK(scored.select("query_id", "neighbor_id", "sim"), k)
  }

  /** IVF (inverted-file) approximate top-k — the second scale path
    * besides [[lshTopK]]. Centroids are a deterministic sample of the
    * corpus (the nCentroids smallest ids — swap for k-means outputs in
    * production; the plumbing is identical). Each corpus vector is
    * assigned to its nearest centroid (one broadcast pass, C dots per
    * vector); a query scores only the vectors in its nProbe nearest
    * centroid buckets. At 100 TB: centroids broadcast, assignment is
    * map-only, the only shuffle is the bucket join on cent_id, and
    * per-bucket work is |corpus|/C × nProbe per query. Similarities
    * are rounded to 6 dp BEFORE every argmax/rank so bucket assignment
    * and ranking are engine-reproducible. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      Vectors.asDouble(col("embedding")).as("ce"))
      .withColumn("cn", Vectors.norm(col("ce")))
    val cents = broadcast(c.orderBy(col("neighbor_id")).limit(nCentroids)
      .select(col("neighbor_id").as("cent_id"), col("ce").as("cent"),
        col("cn").as("centn")))
    def centSim(e: Column, n: Column): Column =
      round(Vectors.dot(e, col("cent")) / (n * col("centn")), 6)
    // argmax over centroids (csim desc, cent_id asc) as a max_by
    // aggregation — partial-aggregates like rankTopK; ce/cn are
    // functionally dependent on neighbor_id so first() is exact
    val assigned = c.join(cents)
      .withColumn("csim", centSim(col("ce"), col("cn")))
      .groupBy("neighbor_id")
      .agg(first(col("ce")).as("ce"), first(col("cn")).as("cn"),
        max_by(col("cent_id"),
          struct(col("csim"), (-col("cent_id")).as("nid"))).as("cent_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      Vectors.asDouble(col("embedding")).as("qe"))
      .withColumn("qn", Vectors.norm(col("qe")))
    val probes = q.join(cents)
      .withColumn("csim", centSim(col("qe"), col("qn")))
      .groupBy("query_id")
      .agg(first(col("qe")).as("qe"), first(col("qn")).as("qn"),
        topKAgg(col("csim"), col("cent_id"), nProbe).as("top"))
      .select(col("query_id"), col("qe"), col("qn"),
        explode(col("top.id")).as("cent_id"))
    val scored = probes.join(assigned, "cent_id")
      .withColumn("sim",
        round(Vectors.dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    rankTopK(scored.select("query_id", "neighbor_id", "sim"), k)
  }

  /** Embedding-cosine near-dup pairs with sim >= minSim (rounded to
    * 6 dp before the threshold so engines agree at the boundary).
    * Exact all-pairs within id-ordered join; for web scale swap the
    * join condition for an [[lshBucket]] equality first. */
  def embeddingNearDupPairs(vectors: DataFrame, minSim: Double): DataFrame = {
    val v = vectors.select(col("vec_id"), Vectors.asDouble(col("embedding")).as("e"))
      .withColumn("nrm", Vectors.norm(col("e")))
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(Vectors.dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("sim"))
      .filter(col("sim") >= minSim)
  }
}
