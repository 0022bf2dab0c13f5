package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DupClusters (connected components) and Decontaminate (eval-overlap
  * flagging) — graph resolution and broadcast-side behavior. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains resolve transitively to the min id") {
    // two components: a 6-node chain (diameter forces >1 round) and a pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = DupClusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(cc(_) == 1L))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc.size == 8, "only nodes present in pairs appear")
  }

  test("a 100-node chain converges in logarithmic rounds") {
    // diameter 99: one-hop propagation alone would need 99 rounds and
    // blow the default maxIter; pointer jumping must finish in ~log
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = DupClusters.connectedComponents(chain, maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 100)
    assert(cc.values.forall(_ == 1L))
  }

  test("survivors: keeps each cluster's min id and every non-dup doc") {
    val docs = (1L to 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val kept = DupClusters.survivors(docs, "doc_id", pairs)
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 6L, 7L, 9L, 10L, 11L, 12L))
  }

  test("decontam: flags exactly the docs sharing a 5-gram; filter drops them") {
    val eva = Seq((100L, "the quick brown fox jumps over a lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "he said the quick brown fox jumps right past us"), // shares 1
      (2L, "completely unrelated words with no overlap here at all"),
      (3L, "fox jumps over a lazy dog indeed")) // shares 2
      .toDF("doc_id", "text")
    val flagged = Decontaminate
      .contaminatedDocs(train, eva, col("doc_id"), col("text"), n = 5)
      .as[(Long, Long)].collect().toMap
    assert(flagged == Map(1L -> 1L, 3L -> 2L))
    val clean = Decontaminate
      .applyFilter(train, eva, "doc_id", col("text"), n = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(clean == Seq(2L))
  }

  test("decontam plan broadcasts the eval side") {
    val docs = table("documents")
    val plan = Decontaminate.contaminatedDocs(
      docs.filter(col("doc_id") % 25 =!= 0),
      docs.filter(col("doc_id") % 25 === 0),
      col("doc_id"), col("text"), n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast-hash join on the eval shingle set:\n$plan")
  }
}
