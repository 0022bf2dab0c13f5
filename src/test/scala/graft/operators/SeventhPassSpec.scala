package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.{LangIdNgram, TextAnalysis}
import graft.operators.Sampling

/** Hand-case specs for the round-7 seventh-pass operators. */
class SeventhPassSpec extends SparkSpec {
  import spark.implicits._

  test("bpeChunkStats: greedy-fill chunk boundaries on trained-BPE costs") {
    // corpus "aaab aaab ab", 1 round -> merge (a,a) (pairs: aa:4, ab:3)
    // costs: aaab -> [aa][a][b] = 3, aaab -> 3, ab -> 2
    // budget 4, chunk = floor(bpe_before/4):
    //   w1 before=0 -> chunk 0; w2 before=3 -> chunk 0; w3 before=6 -> 1
    // chunk 0 holds 6 tokens (overshoot allowed), chunk 1 holds 2
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeChunkStats(df, col("doc_id"), col("text"),
      rounds = 1, budget = 4L).collect().head
    assert(out.getLong(1) === 2L) // n_chunks
    assert(out.getLong(2) === 8L) // n_bpe_tokens
    assert(out.getLong(3) === 6L) // max_chunk_bpe_tokens
  }

  test("langIdNgram: every held-out phrase classifies as its own language") {
    val df = LangIdNgram.TestPhrases.zipWithIndex
      .map { case ((l, p), i) => (i.toLong, l, p) }
      .toDF("doc_id", "expected", "text")
    val out = LangIdNgram.classify(df, col("doc_id"), col("text"))
      .join(df.select("doc_id", "expected"), "doc_id")
    val wrong = out.filter(col("lang_pred") =!= col("expected")).collect()
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString(", ")}")
    // profiles are exactly K deep per language, ranks 1..K
    assert(LangIdNgram.Profiles.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).sorted == (1 to LangIdNgram.K)
    })
  }

  test("langIdNgram margin: confident calls score wide, no-signal text scores zero") {
    // a real held-out phrase: top-1 agrees with classify() and the
    // runner-up sits a wide exact-integer margin away
    val en = Seq((1L, LangIdNgram.TestPhrases.find(_._1 == "en").get._2))
      .toDF("doc_id", "text")
    val m = LangIdNgram.classifyWithMargin(en, col("doc_id"), col("text"))
      .collect().head
    assert(m.getString(1) === "en", "top-1 language")
    assert(m.getString(3) !== "en", "runner-up is a different language")
    assert(m.getLong(5) > 0L, "confident call has a positive margin")
    val c = LangIdNgram.classify(en, col("doc_id"), col("text")).collect().head
    assert(m.getString(1) === c.getString(1) && m.getLong(2) === c.getLong(2),
      "margin form agrees with classify on the top-1 call")
    // text matching no profile trigram ties every language at K*|top|:
    // margin 0 is exactly the 'route to a heavier model' signal
    val qq = Seq((1L, "qqq qqq")).toDF("doc_id", "text")
    val z = LangIdNgram.classifyWithMargin(qq, col("doc_id"), col("text"))
      .collect().head
    assert(z.getLong(5) === 0L, "no-signal text must have zero margin")
  }

  test("langIdNgram: trigram-less docs emit no row; ties break on lang asc") {
    val df = Seq((1L, "!!"), (2L, "zz")).toDF("doc_id", "text")
    assert(LangIdNgram.classify(df, col("doc_id"), col("text"))
      .count() === 0L)
    // a text matching NO profile trigram scores K*|top| for every
    // language -> all tied -> alphabetically first language wins
    val qq = Seq((1L, "qqq qqq")).toDF("doc_id", "text")
    val r = LangIdNgram.classify(qq, col("doc_id"), col("text")).collect().head
    assert(r.getString(1) === LangIdNgram.Seeds.head._1)
  }

  test("langIdNgram: non-Latin scripts survive normalization and classify") {
    // digit/punctuation-laced Russian and Greek: the old `[^a-z ]`
    // normalization mapped BOTH to empty strings (no row at all);
    // the script-aware form must classify them correctly
    val df = Seq(
      (1L, "в 2024 году было 3 решения, но никто не мог объяснить их!"),
      (2L, "το 2024 ειχε 3 αποφασεις, και κανεις δεν μπορουσε να τις εξηγησει."))
      .toDF("doc_id", "text")
    val out = LangIdNgram.classify(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out.length === 2, "non-Latin docs must emit rows now")
    assert(out(0).getString(1) === "ru", s"got ${out(0)}")
    assert(out(1).getString(1) === "el", s"got ${out(1)}")
    // the widened seed set stays alphabetical (the tiebreak contract)
    assert(LangIdNgram.Seeds.map(_._1) ===
      LangIdNgram.Seeds.map(_._1).sorted)
    assert(LangIdNgram.Seeds.map(_._1) === LangIdNgram.TestPhrases.map(_._1))
  }

  test("langIdNgram: unsegmented Han/kana classify with positive margin") {
    // zh/ja have no word boundaries — the char-trigram profiles must
    // classify raw unsegmented text (with digits/punctuation noise the
    // normalization strips), and the zh-vs-ja margin must be positive
    // in both directions (Simplified Han vs kana/kyujitai kanji are
    // disjoint codepoint sets here, the separation the seeds rely on)
    val df = Seq(
      (1L, "2024年的时候没有人能够解释为什么会是这样的事情，我们都知道它不会改变！"),
      (2L, "2024年になっても、それがどうしてなのか誰にも説明できないのである。"))
      .toDF("doc_id", "text")
    val out = LangIdNgram.classifyWithMargin(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === "zh", s"got ${out(0)}")
    assert(out(1).getString(1) === "ja", s"got ${out(1)}")
    out.foreach { r =>
      assert(r.getLong(5) > 0L, s"unsegmented call not confident: $r") }
  }

  test("diversifyTopK: per-group cap holds, survivors keep relative order") {
    // q1 ranks 1..6 with sources AAABBC: cap 2/source -> 1,2(A) 4,5(B)
    // 6(C); re-ranked 1..5
    val hits = Seq(
      ("q1", 1, 10L, "A"), ("q1", 2, 11L, "A"), ("q1", 3, 12L, "A"),
      ("q1", 4, 13L, "B"), ("q1", 5, 14L, "B"), ("q1", 6, 15L, "C")
    ).toDF("query_id", "rank", "doc_id", "source")
    val out = graft.text.Search.diversifyTopK(hits, col("source"),
      k = 5, perGroup = 2).orderBy("rank").collect()
    assert(out.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"))).toSeq
      === Seq((1, 10L), (2, 11L), (3, 13L), (4, 14L), (5, 15L)))
  }

  test("diversifyTopK: caller columns pass through; a pre-existing grp refuses") {
    val hits = Seq(
      ("q1", 1, 10L, "A", "keep1"), ("q1", 2, 11L, "B", "keep2")
    ).toDF("query_id", "rank", "doc_id", "source", "srn")
    // a caller column named after an OLD working name (srn) survives
    // untouched now that working columns use internal names
    val out = graft.text.Search.diversifyTopK(hits, col("source"),
      k = 2, perGroup = 1).orderBy("rank").collect()
    assert(out.map(_.getAs[String]("srn")).toSeq === Seq("keep1", "keep2"))
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2))
    // grp is the one reserved output name — clobbering is refused
    intercept[IllegalArgumentException] {
      graft.text.Search.diversifyTopK(
        hits.withColumnRenamed("srn", "grp"), col("source"), 2, 1)
    }
  }

  test("dedupLines keeps first occurrences in order") {
    val df = Seq((1L, "a\nb\na\nc\nb\na"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 6L && out(0).getLong(2) === 3L)
    // kept text is exactly "a\nb\nc" (first occurrences, in order)
    val expected = df.sparkSession.range(1)
      .select(md5(lit("a\nb\nc"))).collect().head.getString(0)
    assert(out(0).getString(3) === expected)
    assert(out(1).getLong(1) === 1L && out(1).getLong(2) === 1L)
  }

  test("scrubPiiExtended: Luhn separates real cards, IP octets range-check") {
    val df = Seq(
      (1L, "pay 4111 1111 1111 1111 now"),        // Luhn-valid (Visa test)
      (2L, "ref 1234-5678-9012-3456 thanks"),     // card-shaped, Luhn-invalid
      (3L, "pay 4111111111111111 now"),           // unseparated, Luhn-valid
      (4L, "host 10.0.255.9 up"),                 // valid ip
      (5L, "bogus 999.999.999.999 down"),         // out-of-range: NOT an ip
      (6L, "mixed 4111 1111 1111 1111 at 192.168.1.1")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPiiExtended(df, col("text"))
      .select("doc_id", "n_ips", "n_cards", "scrubbed")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 1L), (0L, 0L), (0L, 1L), (1L, 0L), (0L, 0L), (1L, 1L)))
    // invalid card still REDACTS (conservative over-redaction)
    assert(out(1).getString(3) === "ref [CARD] thanks")
    assert(out(4).getString(3) === "bogus 999.999.999.999 down")
    assert(out(5).getString(3) === "mixed [CARD] at [IP]")
  }

  test("grouped split is group-atomic: no group ever straddles splits") {
    // many docs per group; every doc must inherit its group's split
    val df = (0L until 200L).map(i => (i, s"g${i % 7}")).toDF("doc_id", "grp")
    val s = Sampling.withSplit(df, col("grp"), trainPct = 60, valPct = 20)
    assert(s.groupBy("grp").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") =!= 1).count() === 0L)
    // and the split really is the group's own hash split
    val bySplit = s.select("grp", "split").distinct()
    val direct = Sampling.withSplit(df.select("grp").distinct(), col("grp"),
      trainPct = 60, valPct = 20)
    assert(bySplit.except(direct).isEmpty && direct.except(bySplit).isEmpty)
  }

  test("epochOrderKey: per-epoch permutations differ, each is reproducible") {
    val df = (0L until 100L).toDF("doc_id")
    def order(e: Int): Seq[Long] =
      df.select(col("doc_id"), Sampling.epochOrderKey(col("doc_id"), e).as("k"))
        .orderBy(col("k"), col("doc_id")).collect().map(_.getLong(0)).toSeq
    val e0, e0again = order(0)
    val e1 = order(1)
    assert(e0 === e0again)           // reproducible
    assert(e0 !== e1)                // a different permutation per epoch
    assert(e0.sorted === e1.sorted)  // same rows, reordered
  }

  test("bpeChunkStats: bracket words excluded, empty docs emit no row") {
    val df = Seq((1L, "aaab [x] ab"), (2L, "[only] [brackets]"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeChunkStats(df, col("doc_id"), col("text"),
      rounds = 1, budget = 100L).collect()
    // doc 2 has no BPE-eligible words -> absent; doc 1 counts aaab+ab
    assert(out.length === 1 && out.head.getLong(0) === 1L)
    assert(out.head.getLong(1) === 1L) // one chunk under the big budget
    // merge (a,a) on {aaab, ab}: aa:2, ab:2 -> tie breaks (a,b) asc
    // -> (a,a); aaab -> 3 tokens, ab -> 2
    assert(out.head.getLong(2) === 5L)
  }
}
