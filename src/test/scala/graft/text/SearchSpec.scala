package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 retrieval ([[Search.bm25TopK]]) against hand-computed scores. */
class SearchSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")
    ).toDF("doc_id", "text")
  }

  test("bm25TopK: hand-computed scores, ranking, and k cut") {
    // N=3, dl = (3, 2, 4), avgdl = 3.0, df(apple)=1, df(cherry)=2
    // idf(apple)  = ln((3-1+0.5)/(1+0.5) + 1) = ln(8/3)  -> 0.980829
    // idf(cherry) = ln((3-2+0.5)/(2+0.5) + 1) = ln(1.6)  -> 0.470004
    // doc1/apple:  tf=2, denom = 2 + 1.2*(0.25+0.75*3/3) = 3.2
    //   -> 0.980829 * 4.4/3.2  = 1.348640
    // doc3/cherry: tf=3, denom = 3 + 1.2*(0.25+0.75*4/3) = 4.5
    //   -> 0.470004 * 6.6/4.5  = 0.689339
    // doc2/cherry: tf=1, denom = 1 + 1.2*(0.25+0.75*2/3) = 1.9
    //   -> 0.470004 * 2.2/1.9  = 0.544215  (cut by k=2)
    val out = Search.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("q" -> Seq("apple", "cherry")), k = 2)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq(("q", 1, 1L), ("q", 2, 3L)))
    val scores = out.map(_.getDouble(3))
    assert(math.abs(scores(0) - 1.348640) < 1e-6)
    assert(math.abs(scores(1) - 0.689339) < 1e-6)
  }

  test("bm25TopK: multi-term sum and tf saturation") {
    // doc2 matches both banana and cherry; its score is the SUM of the
    // per-term scores. And tf saturation: apple's tf=2 contributes less
    // than 2x a tf=1 hit (k1 bounds the tf gain).
    val out = Search.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("qb" -> Seq("banana", "cherry")), k = 3).collect()
    val d2 = out.find(r => r.getLong(2) == 2L).get.getDouble(3)
    // banana: df=2, idf=0.470004, tf=1, dl=2 -> 0.470004*2.2/1.9 = 0.544215
    // cherry (doc2) = 0.544215; sum = 1.088430
    assert(math.abs(d2 - 1.088430) < 1e-6)
    // saturation check on the first suite's numbers: 1.348640 < 2 * 0.980829
    assert(1.348640 < 2 * 0.980829)
  }

  test("bm25MoreLikeThis: the query doc's distinct tokens are its terms") {
    import spark.implicits._
    val queryDocs = Seq((100L, "apple apple cherry")).toDF("doc_id", "text")
    // identical to an explicit keyword query on {apple, cherry}: the
    // duplicate "apple" in the query text must NOT double-count
    val mlt = Search.bm25MoreLikeThis(docs, col("doc_id"), col("text"),
      queryDocs, col("doc_id"), col("text"), k = 3).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val kw = Search.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("q" -> Seq("apple", "cherry")), k = 3).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(mlt === kw)
  }

  test("rrfFuse: hand-computed fusion, overlap beats single-leg rank 1") {
    import spark.implicits._
    // leg A: d1 rank1, d2 rank2 ; leg B: d2 rank1, d3 rank2.
    // d2 = 1/62 + 1/61 = 0.032523 > d1 = 1/61 = 0.016393 > d3 = 1/62
    val legA = Seq((1L, 1, 10L), (1L, 2, 20L)).toDF("query_id", "rank", "doc_id")
    val legB = Seq((1L, 1, 20L), (1L, 2, 30L)).toDF("query_id", "rank", "doc_id")
    val out = Search.rrfFuse(Seq(legA, legB), k = 3).orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out.map(t => (t._1, t._2)) === Seq((1, 20L), (2, 10L), (3, 30L)))
    assert(math.abs(out(0)._3 - (1.0 / 62 + 1.0 / 61)) < 1e-5)
    assert(math.abs(out(1)._3 - 1.0 / 61) < 1e-5)
  }

  test("bpePairStats: hand-computed pair counts, in-word repeats, tie order") {
    import spark.implicits._
    // words: aaa(1), ab(2), xy(1); pairs: aaa -> aa,aa ; ab -> ab ; xy -> xy
    // counts: aa=2, ab=2, xy=1; tie aa<ab breaks on the pair string
    val d = Seq((1L, "aaa ab"), (2L, "ab xy")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(d, col("text"), k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("aa", 2L), ("ab", 2L), ("xy", 1L)))
    // k cuts deterministically after ordering
    val top2 = TextAnalysis.bpePairStats(d, col("text"), k = 2)
      .as[(String, Long)].collect().toSeq
    assert(top2 === out.take(2))
    // single-char words contribute nothing; empty corpus yields no rows
    val single = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.bpePairStats(single, col("text"), 5).count() == 0)
    // repartition-invariant on the real corpus; bounded top-k plan
    val docs500 = table("documents")
    val a = TextAnalysis.bpePairStats(docs500, col("text"), 20)
      .as[(String, Long)].collect().toSeq
    val b = TextAnalysis.bpePairStats(docs500.repartition(7), col("text"), 20)
      .as[(String, Long)].collect().toSeq
    assert(a === b)
    assert(a.length == 20 && a.map(_._2).sliding(2).forall(s => s.head >= s.last))
    val plan = TextAnalysis.bpePairStats(docs500, col("text"), 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k:\n$plan")
  }

  test("bigramSurprisal: hand-computed conditionals; short docs drop") {
    import spark.implicits._
    // corpus bigrams: "a a" x1, "a b" x2 -> c1(a)=3
    // surp(a a) = -log2(1/3) = 1.584963 ; surp(a b) = -log2(2/3) = 0.584963
    val d = Seq((1L, "a a b"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(d, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L)._1 == 2L)
    assert(math.abs(got(1L)._2 - 1.084963) < 1e-6, got(1L).toString)
    assert(got(2L) == ((1L, 0.584963)), got(2L).toString)
    assert(!got.contains(3L), "single-token docs have no bigrams")
  }

  test("interpolatedSurprisal: JM mix hand case; singleton contexts lose certainty") {
    import spark.implicits._
    // corpus: docs "a b", "a c", "solo" -> c1(a)=2, c2(a b)=c2(a c)=1;
    // unigrams N=5 (the model covers the WHOLE corpus, solo included),
    // ctf(b)=ctf(c)=1
    // surp(a b) = -log2(0.7*(1/2) + (1-0.7)*(1/5))
    val lam = 0.7
    val expected = BigDecimal(
      -math.log(lam * 0.5 + (1.0 - lam) * 0.2) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d = Seq((1L, "a b"), (2L, "a c"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.interpolatedSurprisal(d, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L) == ((1L, expected)), got(1L).toString)
    assert(got(2L) == ((1L, expected)))
    assert(!got.contains(3L), "single-token docs have no bigrams")
    // the rung's reason to exist: a singleton context scores its only
    // continuation as certainty under the pure bigram model (surp 0),
    // but stays strictly positive interpolated
    val singleton = Seq((1L, "x y"), (2L, "filler words here"))
      .toDF("doc_id", "text")
    val pure = TextAnalysis.bigramSurprisal(singleton, col("doc_id"),
      col("text")).as[(Long, Long, Double)].collect()
      .map(t => t._1 -> t._3).toMap
    val interp = TextAnalysis.interpolatedSurprisal(singleton,
      col("doc_id"), col("text")).as[(Long, Long, Double)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(pure(1L) == 0.0, "pure bigram model: singleton context = certainty")
    assert(interp(1L) > 0.0, "interpolated: the unigram floor keeps it positive")
    intercept[IllegalArgumentException] {
      TextAnalysis.interpolatedSurprisal(d, col("doc_id"), col("text"),
        lambda = 1.0) }
  }

  test("sourceDrift: identical feeds read 0 bits, disjoint feeds read large") {
    import spark.implicits._
    // twin: byte-identical token multisets -> p = q exactly per
    // bucket (same counts, same totals) -> every KL term is log2(1)
    val twin = Seq(
      (1L, "alpha beta alpha", "s1"), (2L, "alpha beta alpha", "s2"))
      .toDF("doc_id", "text", "source")
    val kl0 = TextAnalysis.sourceDrift(twin, col("text"), col("source"),
        buckets = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(kl0.map(_._2).toSeq.forall(_ == 3L))
    kl0.foreach { case (s, _, kl) =>
      assert(kl == 0.0, s"$s: identical feeds must diverge 0, got $kl") }
    // disjoint vocabularies: both sources drift hard from each other
    // (enough mass that add-one smoothing doesn't flatten the
    // distributions — tiny feeds legitimately read near-uniform)
    val split = Seq(
      (1L, Seq.fill(40)("alpha").mkString(" "), "s1"),
      (2L, Seq.fill(40)("gamma").mkString(" "), "s2"))
      .toDF("doc_id", "text", "source")
    val kls = TextAnalysis.sourceDrift(split, col("text"), col("source"),
        buckets = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kls.values.forall(_ > 1.0),
      s"disjoint feeds must diverge strongly: $kls")
    // KL is never (meaningfully) negative — smoothed proper
    // distributions; allow the 9-dp per-term rounding slack
    val mixed = Seq(
      (1L, "alpha beta gamma", "s1"), (2L, "alpha beta delta", "s2"),
      (3L, "alpha epsilon", "s3")).toDF("doc_id", "text", "source")
    TextAnalysis.sourceDrift(mixed, col("text"), col("source"), buckets = 64)
      .collect().foreach(r =>
        assert(r.getDouble(2) >= -1e-5, s"negative KL: ${r.getString(0)}"))
  }

  test("bm25TopK: docs without query terms never rank; empty query yields nothing") {
    val out = Search.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("qa" -> Seq("apple")), k = 5).collect()
    assert(out.map(_.getLong(2)).toSet === Set(1L))
    val none = Search.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("qz" -> Seq("zucchini")), k = 5).collect()
    assert(none.isEmpty)
  }
}
