package graft

import org.apache.spark.sql.functions._

import graft.ann.{Knn, Sq}

class SqSpec extends SparkSpec {

  private lazy val v = table("embeddings")
  private lazy val queries = v.filter(col("vec_id") < 10)
  private lazy val corpus = v.filter(col("vec_id") >= 10)

  private lazy val sq = Sq.sqTopK(queries, corpus, k = 5).cache()

  test("returns exactly k exact-cosine rows per query, rank-ordered") {
    val rows = sq.collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == queries.count())
    byQuery.values.foreach { rs =>
      assert(rs.length == 5)
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to 5))
      ranked.sliding(2).foreach { case Array(a, b) =>
        val (sa, sb) = (a.getDouble(3), b.getDouble(3))
        assert(sa > sb || (sa == sb && a.getLong(2) < b.getLong(2)))
      }
    }
  }

  test("reported sims are the true cosines (re-rank is exact)") {
    val brute = Knn.bruteForceTopK(queries, corpus, k = 200)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    val joined = sq.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("bsim").isNull).count() == 0)
    assert(joined.filter(col("sim") =!= col("bsim")).count() == 0)
  }

  test("recall@5 vs brute force: 8-bit codes + 100-shortlist lose <5%") {
    // SQ scores EVERY corpus vector (no coarse pruning), so its only
    // loss is quantization noise inside the shortlist cut — with 256
    // levels per dim that is tiny; gate at 95% (measured: 1.0 here)
    val brute = Knn.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id")
    val hits = sq.select("query_id", "neighbor_id")
      .intersect(brute).count()
    assert(hits >= (0.95 * brute.count()).toLong,
      s"recall ${hits.toDouble / brute.count()}")
  }

  test("constant dims quantize to code 0 and reconstruct losslessly") {
    import spark.implicits._
    // 4-dim corpus where dims 1 and 3 are constant: top-1 by SQ score
    // must equal exact cosine's winner (quantization exact on constant
    // dims, 2-level on the varying ones still ranks correctly)
    val corpus = Seq(
      (10L, Array(1.0f, 5.0f, 0.0f, 2.0f)),
      (11L, Array(0.0f, 5.0f, 1.0f, 2.0f)),
      (12L, Array(0.5f, 5.0f, 0.5f, 2.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Sq.sqTopK(q, corpus, k = 1, levels = 256, shortlist = 3)
      .collect()
    assert(top.head.getLong(2) === 10L)
  }
}
