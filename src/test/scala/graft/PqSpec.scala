package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ann.{Knn, Pq}

class PqSpec extends SparkSpec {

  private lazy val v = table("embeddings")
  private lazy val queries = v.filter(col("vec_id") < 10)
  private lazy val corpus = v.filter(col("vec_id") >= 10)

  private lazy val pq =
    Pq.ivfPqTopK(queries, corpus, k = 5).cache()

  test("returns exactly k exact-cosine rows per query, rank-ordered") {
    val rows = pq.collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == queries.count())
    byQuery.values.foreach { rs =>
      assert(rs.length == 5)
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to 5))
      // sims non-increasing in rank; ties broken by neighbor_id asc
      ranked.sliding(2).foreach { case Array(a, b) =>
        val (sa, sb) = (a.getDouble(3), b.getDouble(3))
        assert(sa > sb || (sa == sb && a.getLong(2) < b.getLong(2)))
      }
    }
  }

  test("reported sims are the true cosines (re-rank is exact)") {
    // join back to brute-force scores: every (query, neighbor) the PQ
    // path reports must carry the same 6-dp cosine the exact scorer
    // computes — ADC only selects candidates, never alters scores
    val brute = Knn.bruteForceTopK(queries, corpus, k = 200)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    val joined = pq.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("bsim").isNull).count() == 0)
    assert(joined.filter(col("sim") =!= col("bsim")).count() == 0)
  }

  test("recall@5: tracks the IVF ceiling; ADC shortlist loses <10%") {
    // two gates, calibrated on this data (near-uniform synthetic
    // vectors — the hard case for coarse quantization):
    //  - relative: PQ scoring must recover >=90% of what EXACT scoring
    //    of the same nProbe buckets returns (isolates the ADC
    //    approximation from the shared IVF pruning; measured 0.98)
    //  - absolute: recall@5 vs brute force within 85% of ivfTopK's own
    //    (measured equal, 0.46 — the coarse quantizer is the shared
    //    ceiling). Guards against a silent candidate-path bug.
    val total = queries.count() * 5
    def overlap(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame): Double =
      a.select(col("query_id"), col("neighbor_id"))
        .join(b.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id")).count().toDouble / total
    val brute = Knn.bruteForceTopK(queries, corpus, k = 5).cache()
    val ivf = Knn.ivfTopK(queries, corpus, k = 5).cache()
    assert(overlap(pq, ivf) >= 0.9, s"vs-IVF overlap = ${overlap(pq, ivf)}")
    assert(overlap(pq, brute) >= 0.85 * overlap(ivf, brute),
      s"recall ${overlap(pq, brute)} vs IVF's ${overlap(ivf, brute)}")
  }

  test("trained-centroid overload: k exact-sim rows per query") {
    val trained = Pq.ivfPqTopK(queries, corpus, k = 5,
      centroids = graft.ann.KMeans.lloyd(corpus, k = 8, iters = 2),
      nProbe = 2, m = 4, nCodes = 16, shortlist = 100, dim = 64).cache()
    val byQuery = trained.collect().groupBy(_.getLong(0))
    assert(byQuery.size == queries.count())
    assert(byQuery.values.forall(_.length == 5))
    // sims are true cosines here too
    val brute = Knn.bruteForceTopK(queries, corpus, k = 200)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    val joined = trained.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("bsim").isNull || col("sim") =!= col("bsim")).count() == 0)
  }

  test("deterministic across runs") {
    val a = pq.collect().map(_.toString).sorted
    val b = Pq.ivfPqTopK(queries, corpus, k = 5).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("scoring join ships codes, not embeddings") {
    // the ADC-scored candidate frame must not carry any array<double>
    // column: vectors enter only the bounded re-rank fetch. Structural
    // proxy: in the physical plan, every SortMergeJoin/ShuffledHashJoin
    // over the corpus codes has build/stream schemas free of array
    // types wider than the m-entry code rows.
    val plan = pq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the shortlist aggregate is the bounded-heap TopKPairs, planned
    // with partial aggregation (objHashAggregate shows partial_ too)
    assert(plan.contains("graft_topk_pairs"))
    assert(plan.contains("partial_"))
  }
}
