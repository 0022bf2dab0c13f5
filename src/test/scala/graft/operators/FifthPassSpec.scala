package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Decontaminate

/** Hand-case specs for the round-5 fifth-pass families (g27/g28, t18,
  * x8) on adversarial inputs the oracle corpus can't produce. */
class FifthPassSpec extends SparkSpec {
  import spark.implicits._

  test("abcClassification: cumulative-share cuts with ties and tiny groups") {
    // group g: totals 80, 15, 5 -> exactly one member per class
    // (cumshares 0.8, 0.95, 1.0 land ON the cut boundaries: <=)
    // group h: single member -> share 1.0 -> class C
    val df = Seq(("g", 1L, 80.0), ("g", 2L, 15.0), ("g", 3L, 5.0),
      ("h", 9L, 7.0)).toDF("grp", "mem", "v")
    val out = Measures.abcClassification(df, col("grp"), col("mem"), col("v"))
      .orderBy("grp", "abc_class").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq === Seq(
      ("g", "A", 1L, 80.0), ("g", "B", 1L, 15.0), ("g", "C", 1L, 5.0),
      ("h", "C", 1L, 7.0)))
  }

  test("fkAudit counts orphans, null FKs, and childless parents") {
    val child = Seq(Some(1L), Some(1L), Some(3L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Profiler.fkAudit(child, col("fk"), parent, col("pk"), "c->p")
      .collect().head
    assert(r.getString(0) === "c->p")
    assert(r.getLong(1) === 4L) // n_child
    assert(r.getLong(2) === 1L) // null keys
    assert(r.getLong(3) === 1L) // orphan (fk=3)
    assert(r.getLong(4) === 2L) // parents
    assert(r.getLong(5) === 1L) // childless (pk=2)
  }

  test("overlapFractions grades partial and total contamination") {
    val eval = Seq((100L, "a b c d e f")).toDF("id", "t") // shingles: abcde, bcdef
    val train = Seq(
      (1L, "a b c d e x y z w v"),  // 6 shingles, 1 shared (abcde)
      (2L, "a b c d e f"),          // 2 shingles, 2 shared
      (3L, "z y x w v u"),          // 2 shingles, 0 shared
      (4L, "too short")             // no 5-gram -> no row
    ).toDF("id", "t")
    val out = Decontaminate.overlapFractions(train, eval, col("id"), col("t"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq === Seq(
      (1L, 6L, 1L, round6(1.0 / 6)), (2L, 2L, 2L, 1.0), (3L, 2L, 0L, 0.0)))
  }
  private def round6(v: Double): Double = math.round(v * 1e6) / 1e6

  test("temporalSplit: boundary at 90% of the span, halves disjoint") {
    def ts(min: Int) = new Timestamp(60000L * min)
    // span 0..100 min -> boundary at 90 min; events at 0,10,...,100
    val df = (0 to 100 by 10).map(m => (ts(m), m.toLong)).toDF("ts", "uid")
    val out = Sampling.temporalSplit(df, col("ts"), col("uid"))
      .orderBy(col("split").desc).collect()
    val train = out(0); val test = out(1)
    assert(train.getString(0) === "train" && train.getLong(1) === 9L)
    assert(test.getString(0) === "test" && test.getLong(1) === 2L)
    assert(train.getTimestamp(4).before(test.getTimestamp(3)))
  }
}
