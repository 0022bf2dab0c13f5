package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ann.Knn
import graft.streaming.Events
import graft.text.TextAnalysis

/** Hand-case specs for the round-6 sixth-pass operators (g30 skew
  * report, e12 recall audit, t15c BPE encode) on inputs whose expected
  * values are computable by hand. */
class SixthPassSpec extends SparkSpec {
  import spark.implicits._

  test("keyShareReport: exact counts, shares, rank ties on key asc") {
    // 10 rows: a×5, b×3, c×1, d×1 — c and d tie at 1 and must rank in
    // key order; k=3 cuts d off
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("k")
    val out = Skew.keyShareReport(df, col("k"), k = 3).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getInt(3))).toSeq === Seq(
      ("a", 5L, 0.5, 1), ("b", 3L, 0.3, 2), ("c", 1L, 0.1, 3)))
  }

  test("recallAtK: perfect, partial, and empty approximate legs") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    // q1 perfect, q2 half right (one hit, one miss), q3 missed entirely
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val out = Knn.recallAtK(approx, exact).orderBy("query_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq === Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)))
  }

  test("bpeEncode: trained merges shrink token counts, greedy a==b runs") {
    // corpus: "aaab aaab ab" — round 1 merges the most frequent pair.
    // pairs of aaab (per word): aa, aa, ab; weighted ×2 -> aa:4, ab:3
    // (ab also from the lone "ab" word) -> merge (a,a).
    // greedy left-to-right on [a][a][a][b] -> [aa][a][b] (3 symbols)
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out1 = TextAnalysis.bpeEncode(df, col("doc_id"), col("text"),
      rounds = 1).collect().head
    assert(out1.getLong(1) === 3L) // n_words
    assert(out1.getLong(2) === 10L) // n_chars: 4+4+2
    // aaab -> 3 symbols each, ab -> 2 (untouched by the (a,a) merge)
    assert(out1.getLong(3) === 8L)
    // more rounds never increase the count; round 0 of training is
    // the char count itself
    val out3 = TextAnalysis.bpeEncode(df, col("doc_id"), col("text"),
      rounds = 3).collect().head
    assert(out3.getLong(3) <= out1.getLong(3))
  }

  test("funnelLatency: per-step conversion latencies incl. R-7 percentiles") {
    def ts(secs: Long) = new Timestamp(secs * 1000L)
    // u1 converts fully (view->click 60s, click->purchase 60s); u2
    // clicks 30s after viewing but never purchases; u3 clicks without
    // ever viewing (not in the funnel at all)
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0), (2L, ts(60), 1L, "click", 0.0),
      (3L, ts(120), 1L, "purchase", 0.0),
      (4L, ts(0), 2L, "view", 0.0), (5L, ts(30), 2L, "click", 0.0),
      (6L, ts(10), 3L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.funnelLatency(ev, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
    // step 2: secs {60, 30} -> mean 45, p50 45, p90 R-7 = 30+0.9*30 = 57
    assert(out(0).getInt(0) === 2 && out(0).getString(1) === "click")
    assert(out(0).getLong(2) === 2L)
    assert(out(0).getDouble(3) === 45.0)
    assert(out(0).getDouble(4) === 45.0)
    assert(out(0).getDouble(5) === 57.0)
    // step 3: only u1 -> all stats 60
    assert(out(1).getInt(0) === 3 && out(1).getString(1) === "purchase")
    assert(out(1).getLong(2) === 1L)
    assert(out(1).getDouble(3) === 60.0)
    assert(out(1).getDouble(4) === 60.0)
    assert(out(1).getDouble(5) === 60.0)
  }

  test("intervalJoin: trailing-window matches, boundaries inclusive") {
    def ts(secs: Long) = new Timestamp(secs * 1000L)
    val clicks = Seq((10L, 1L, ts(3600))).toDF("event_id", "user_id", "ts")
    val views = Seq(
      (1L, 1L, ts(0)),     // exactly lookback before the click: IN
      (2L, 1L, ts(1800)),  // inside the window: IN
      (3L, 1L, ts(3600)),  // same instant: IN
      (4L, 1L, ts(3601)),  // after the click: OUT
      (5L, 2L, ts(3500))   // other user: OUT
    ).toDF("event_id", "user_id", "ts")
    val out = Events.intervalJoin(clicks, views, "1 hour")
      .select("r_event_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L))
  }

  test("bpe bracket safety: tokens containing '[' or ']' are excluded") {
    // '[a]' (and 'ab]') would desynchronize the bracket-wrapped symbol
    // representation — bpeWords drops them from train AND encode, so
    // the result equals the clean corpus "aaab aaab ab" bit for bit
    val df = Seq((1L, "aaab [a] aaab ab]"), (2L, "ab")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(df, col("text"), rounds = 1).collect()
    assert(m.length === 1)
    assert((m.head.getString(1), m.head.getString(2)) === ("a", "a"))
    val out = TextAnalysis.bpeEncode(df, col("doc_id"), col("text"),
      rounds = 1).orderBy("doc_id").collect()
    // doc 1 counts range over {aaab, aaab} only: 2 words, 8 chars,
    // [aa][a][b] ×2 = 6 tokens; doc 2 is untouched clean text
    assert(out(0).getLong(1) === 2L)
    assert(out(0).getLong(2) === 8L)
    assert(out(0).getLong(3) === 6L)
    assert(out(1).getLong(3) === 2L)
  }

  test("bpeEncode matches bpeTrain's merge table applied by hand") {
    // two docs; verify the merge table drives the encode (the count
    // drops by exactly the number of merged-pair occurrences, greedily
    // counted)
    val df = Seq((1L, "the then the"), (2L, "then")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, col("text"), rounds = 1).collect()
    assert(merges.length === 1)
    val (a, b) = (merges.head.getString(1), merges.head.getString(2))
    // most frequent pair across {the×2, then×2}: th and he tie at 4
    // ((t,h) in every word; (h,e) in every word) -> tie breaks on
    // (a, b) asc -> (h,e)... "he" vs "th": 'h' < 't' so (h,e) wins
    assert((a, b) === ("h", "e"))
    val out = TextAnalysis.bpeEncode(df, col("doc_id"), col("text"),
      rounds = 1).orderBy("doc_id").collect()
    // doc 1: the(3->2) the(3->2) then(4->3) = 7; doc 2: then = 3
    assert(out(0).getLong(3) === 7L)
    assert(out(1).getLong(3) === 3L)
  }
}
