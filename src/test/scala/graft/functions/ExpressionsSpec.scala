package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.TextDedup

/** Direct checks of the custom codegen'd Catalyst expressions against
  * their higher-order-function reference formulations. */
class ExpressionsSpec extends SparkSpec {

  test("DotProduct equals the HOF fold, both codegen and interpreted") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.5), Array(2.0, 2.0)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(Vectors.dot(col("a"), col("b")).as("d"), hof.as("h"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("DotProduct is null on null input arrays") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(Vectors.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("WordShingles/H32Array equal their HOF formulations on real docs") {
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.text.TextAnalysis
    val toks = TextAnalysis.tokens(col("text"))
    val hofShingles = array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3)))))
        .otherwise(array()))
    val fast = TextDedup.shingles(col("text"))
    val rows = table("documents")
      .select(fast.as("fast"), hofShingles.as("ref"),
        ColumnBridge.column(H32Array(ColumnBridge.expression(fast))).as("hfast"),
        transform(fast, s => Hashing.h32(s)).as("href"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("SimHash64 equals the per-bit HOF formulation on real docs") {
    import graft.text.TextAnalysis
    val toks = TextAnalysis.tokens(col("text"))
    def half(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val votes = transform(sequence(lit(0), lit(31)), j =>
        aggregate(toks, lit(0L), (acc, t) =>
          acc + when(floor(h(t) / pow(lit(2.0), j)).cast("long") % 2 === 1, 1L)
            .otherwise(-1L)))
      aggregate(
        zip_with(votes, sequence(lit(0), lit(31)),
          (v, j) => when(v > 0, pow(lit(2.0), j).cast("long")).otherwise(0L)),
        lit(0L), (acc, x) => acc + x)
    }
    val hof = format_string("%08x%08x", half(Hashing.md5Hi32), half(Hashing.md5Lo32))
    val rows = table("documents")
      .select(TextDedup.simHashHex(col("text")).as("fast"), hof.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("RollingHash64 equals the aggregate fold on real docs") {
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.text.TextAnalysis
    val toksN = filter(split(TextAnalysis.normalized(col("text")), " "), t => t =!= "")
    val rows = table("documents").select(
      ColumnBridge.column(RollingHash64(ColumnBridge.expression(toksN))).as("fast"),
      Hashing.rollingHash(toksN).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("LshSignBucket equals the HOF projection form on real embeddings") {
    import graft.ann.Knn
    val planes = 6
    // the aggregate(zip_with(...)) formulation lshBucket replaced, with
    // the same md5-derived weight table injected as a literal array
    // (the corpus is 64-dim; zip_with pads with null past either end,
    // and null products drop out of the fold like the kernel's skip)
    val hof = concat_ws("", (0 until planes).map { p =>
      val w = (0 until 64).map(d => LshSignBucket.weight(p, d).toDouble)
      val proj = aggregate(
        zip_with(col("e"), typedLit(w), (x, wv) => x * wv),
        lit(0.0), (acc, v) => acc + coalesce(v, lit(0.0)))
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
    val rows = table("embeddings")
      .select(Vectors.asDouble(col("embedding")).as("e"))
      .select(Knn.lshBucket(col("e"), planes).as("fast"), hof.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("LshSignBucket weights are md5-derived with no cross-plane periodicity") {
    // the r2 family (31p+17d)%7-3 collapsed to 7 distinct planes; the
    // md5 family must give 24 distinct weight rows over 64 dims
    val rows = (0 until 24).map(p => (0 until 64).map(d => LshSignBucket.weight(p, d)))
    assert(rows.distinct.size == 24)
    rows.flatten.foreach(w => assert(w >= -3 && w <= 3))
    // and every weight value actually occurs (sanity: not degenerate)
    assert(rows.flatten.distinct.sorted == (-3 to 3).toSeq)
  }

  test("LshSignBucket skips null vector elements identically in codegen and interpreted") {
    import spark.implicits._
    import graft.ann.Knn
    val df = Seq(
      (1L, Seq(Some(1.0), None, Some(-2.0), Some(0.5))),
      (2L, Seq(Some(1.0), Some(0.0), Some(-2.0), Some(0.5))))
      .toDF("id", "e")
    val out = df.select(col("id"), Knn.lshBucket(col("e"), 8).as("b")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // expected: null contributes 0 — compute the same fold in Scala
    def bucket(v: Seq[Option[Double]]): String =
      (0 until 8).map { p =>
        val s = v.zipWithIndex.collect { case (Some(x), d) =>
          x * LshSignBucket.weight(p, d) }.foldLeft(0.0)(_ + _)
        if (s >= 0) '1' else '0'
      }.mkString
    assert(out(1L) == bucket(Seq(Some(1.0), None, Some(-2.0), Some(0.5))))
    assert(out(2L) == bucket(Seq(Some(1.0), Some(0.0), Some(-2.0), Some(0.5))))
    // interpreted path: direct eval over a GenericArrayData with a null
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit1 = Literal.create(
      new GenericArrayData(Array[Any](1.0, null, -2.0, 0.5)),
      ArrayType(DoubleType, containsNull = true))
    val interp = LshSignBucket(lit1, 8).eval(null).toString
    assert(interp == bucket(Seq(Some(1.0), None, Some(-2.0), Some(0.5))))
  }

  test("ByteWindowSums decode equals the partition-batched stub on real docs") {
    import graft.multimodal.Multimodal
    val assets = Multimodal.asAssets(table("documents"))
    def feats(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      df.select("asset_id", "features").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val fast = feats(Multimodal.decodeStub(assets))
    val ref = feats(Multimodal.decodeStubPartitioned(assets))
    assert(fast.nonEmpty)
    assert(fast == ref)
  }

  test("ByteWindowMeans equals a hand-computed contiguous-window mean") {
    import graft.multimodal.Multimodal
    val assets = Multimodal.asAssets(table("documents"))
    val got = Multimodal.resizeStub(assets, targetDim = 8)
      .select("asset_id", "payload", "resized").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getSeq[Double](2)))
    assert(got.nonEmpty)
    got.foreach { case (_, bytes, out) =>
      assert(out.length == 8)
      val n = bytes.length
      (0 until 8).foreach { w =>
        val (st, en) = (w * n / 8, (w + 1) * n / 8)
        val exp = if (en > st)
          bytes.slice(st, en).map(_ & 0xff).map(_.toDouble).sum / (en - st)
        else 0.0
        assert(out(w) == exp, s"window $w")
      }
    }
    // short payload: empty windows are 0.0
    import spark.implicits._
    val tiny = Multimodal.resizeStub(
      Multimodal.asAssets(Seq((1L, "abc")).toDF("doc_id", "text")), targetDim = 8)
      .select("resized").collect()(0).getSeq[Double](0)
    assert(tiny.count(_ == 0.0) == 5 && tiny.length == 8)
  }

  test("ByteAHash64: hand case, integer threshold, perceptual pairing") {
    import graft.multimodal.Multimodal
    import spark.implicits._
    // payload bytes 0..63: window w holds the single byte w; total=2016,
    // n=64, width=1 -> bit w set iff w*64 > 2016 iff w >= 32
    val ramp = new String((0 until 64).map(_.toChar).toArray)
    val fp = Multimodal.asAssets(Seq((1L, ramp)).toDF("doc_id", "text"))
      .select(Multimodal.aHashHex(col("payload"))).first().getString(0)
    assert(fp == "00000000ffffffff", fp)
    // scala-side kernel agrees with the column (codegen) path on real docs
    val both = Multimodal.asAssets(table("documents"))
      .select(col("payload"), Multimodal.aHashHex(col("payload")).as("fp"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(graft.functions.ByteAHash64.hash(r.getAs[Array[Byte]](0)).toString
        == r.getString(1))
    }
    // near-identical payloads pair at small hamming; disjoint ones don't
    // all-pair: doc vs its one-char-substituted copy
    val docs = table("documents").select("doc_id", "text").limit(50)
    val dirty = docs.select((col("doc_id") + 1000L).as("doc_id"),
      concat(lit("a"), col("text").substr(lit(2), length(col("text")))).as("text"))
    val pairs = Multimodal.perceptualDupPairs(
      Multimodal.asAssets(docs.unionByName(dirty)), maxDist = 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty, "substituted copies must pair")
    assert(pairs.forall(_._3 <= 3))
    val crossSelf = pairs.count(p => p._2 == p._1 + 1000L)
    assert(crossSelf > 25, s"most dirty copies should pair with their original, got $crossSelf")
  }

  test("sampleFrames slices every stride-th frame, drops the partial tail") {
    import graft.multimodal.Multimodal
    import spark.implicits._
    // 25 bytes, frameBytes=4, stride=2 -> hop 8, offsets 0,8,16
    // (start 24 would need bytes 24..27 — partial, dropped)
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxy"), (2L, "abc"))
      .toDF("doc_id", "text")
    val out = Multimodal.sampleFrames(Multimodal.asAssets(docs),
        frameBytes = 4, stride = 2)
      .select(col("asset_id"), col("frame_no"),
        decode(col("frame"), "UTF-8").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(out.toSeq == Seq(
      (1L, 0L, "abcd"), (1L, 2L, "ijkl"), (1L, 4L, "qrst")))
  }

  test("MinHashMins equals per-k array_min(transform(affine))") {
    import spark.implicits._
    val df = Seq(Seq(12L, 999999L, 31L), Seq(7L)).toDF("hs")
    val reference = array(TextDedup.MinHashA.zip(TextDedup.MinHashB).map {
      case (a, b) => array_min(transform(col("hs"), h => Hashing.affine(h, a, b)))
    }: _*)
    val rows = df.select(
      TextDedup.minHashSignatureFromHashes(col("hs")).as("fast"),
      reference.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
