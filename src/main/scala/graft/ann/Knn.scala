package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("sim"))
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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("sim"))
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
    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = c.join(cents)
      .withColumn("csim", centSim(col("ce"), col("cn")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("neighbor_id"), col("ce"), col("cn"), col("cent_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      Vectors.asDouble(col("embedding")).as("qe"))
      .withColumn("qn", Vectors.norm(col("qe")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cent_id").asc)
    val probes = q.join(cents)
      .withColumn("csim", centSim(col("qe"), col("qn")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qe"), col("qn"), col("cent_id"))
    val scored = probes.join(assigned, "cent_id")
      .withColumn("sim",
        round(Vectors.dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("sim"))
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
