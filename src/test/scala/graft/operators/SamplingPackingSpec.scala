package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ann.KMeans
import graft.text.Packing

/** Sampling (hash splits), Packing (token-budget bins) and KMeans
  * (centroid training) — determinism and hand-checked small cases. */
class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  test("withSplit partitions the corpus and is repartition-invariant") {
    val docs = table("documents")
    val split = Sampling.withSplit(docs, col("doc_id"))
      .groupBy("split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(split.values.sum == docs.count())
    assert(split.keySet.subsetOf(Set("train", "val", "test")))
    assert(split("train") > split.getOrElse("val", 0L))
    val again = Sampling.withSplit(docs.repartition(7), col("doc_id"))
      .groupBy("split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(again == split)
  }

  test("shardManifest: layout-invariant, edit-sensitive, order-sensitive") {
    import spark.implicits._
    import graft.text.Packing
    val docs = (1L to 50L).map(i => (i, s"doc $i content word$i"))
      .toDF("doc_id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame, epoch: Int = 0) =
      Packing.shardManifest(df, col("doc_id"), col("text"), nShards = 4,
          epoch = epoch)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val base = manifest(docs)
    assert(base.keySet === Set(0L, 1L, 2L, 3L))
    assert(base.values.map(_._1).sum === 50L)
    // cluster layout / partitioning changes NOTHING
    assert(manifest(docs.repartition(13)) === base)
    // editing one doc flips exactly its shard's hash, counts intact
    val edited = docs.withColumn("text",
      when(col("doc_id") === 7L, lit("TAMPERED")).otherwise(col("text")))
    val m2 = manifest(edited)
    val changed = base.keys.filter(k => base(k)._3 != m2(k)._3).toSeq
    assert(changed.length === 1, s"exactly one shard must flip: $changed")
    assert(base.values.map(_._1).toSeq.sorted ===
      m2.values.map(_._1).toSeq.sorted, "doc counts unchanged by an edit")
    // a different epoch reorders within shards: hashes change, counts
    // and token mass don't
    val e1 = manifest(docs, epoch = 1)
    assert(e1.keys === base.keys)
    base.foreach { case (k, (n, tok, h)) =>
      assert(e1(k)._1 === n && e1(k)._2 === tok)
    }
    assert(base.exists { case (k, (_, _, h)) => e1(k)._3 != h },
      "epoch permutation must move at least one shard's content hash")
  }

  test("dedupSplit: clusters move atomically; the leakage audit reads empty") {
    import spark.implicits._
    val docs = (1L to 30L).toDF("doc_id")
    // two components ({1,2,3} via a chain, {10,11}) + 25 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val clusters = graft.dedup.DupClusters.connectedComponents(pairs)
    val assign = Sampling.dedupSplit(docs, col("doc_id"), clusters)
    assert(assign.count() === 30, "every doc gets exactly one row")
    // cluster members share both group and split
    val byGrp = assign.filter(col("doc_id").isin(1L, 2L, 3L))
      .select("grp", "split").distinct().collect()
    assert(byGrp.length === 1 && byGrp(0).getLong(0) === 1L)
    val pair2 = assign.filter(col("doc_id").isin(10L, 11L))
      .select("grp", "split").distinct().collect()
    assert(pair2.length === 1 && pair2(0).getLong(0) === 10L)
    // singletons key on themselves
    assert(assign.filter(col("doc_id") === 20L).collect()(0)
      .getLong(1) === 20L)
    // the audit x14 runs finds NOTHING to flag — zero leaked rows
    val leaked = Sampling.splitLeakageAudit(pairs, assign)
      .filter(col("leaked")).count()
    assert(leaked === 0, "cluster-atomic split must leak no pair")
    // assignment is stable under repartitioning
    val again = Sampling.dedupSplit(docs.repartition(7), col("doc_id"),
      clusters).select("doc_id", "split")
    assert(assign.select("doc_id", "split").exceptAll(again).isEmpty)
  }

  test("sampleFraction: nested fractions give nested samples") {
    val docs = table("documents")
    val s20 = Sampling.sampleFraction(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    val s50 = Sampling.sampleFraction(docs, col("doc_id"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s20.subsetOf(s50))
    assert(Sampling.sampleFraction(docs, col("doc_id"), 1.0).count() == docs.count())
    assert(Sampling.sampleFraction(docs, col("doc_id"), 0.0).count() == 0)
  }

  test("sampleFraction resolves sub-percent fractions") {
    import spark.implicits._
    val big = spark.range(200000).select(col("id").as("k"))
    val n = Sampling.sampleFraction(big, col("k"), 0.001).count()
    // 200 expected; the md5 bucketing should land well within 3 sigma
    assert(n > 100 && n < 300, s"0.1% of 200k gave $n rows")
  }

  test("stratifiedSample equals per-stratum sampleFraction") {
    val docs = table("documents")
    val mixed = Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 0.5), default = 0.2)
      .select("doc_id").as[Long].collect().toSet
    val expected =
      Sampling.sampleFraction(docs.filter(col("source") === "src0"),
        col("doc_id"), 0.5).select("doc_id").as[Long].collect().toSet ++
      Sampling.sampleFraction(docs.filter(col("source") =!= "src0"),
        col("doc_id"), 0.2).select("doc_id").as[Long].collect().toSet
    assert(mixed == expected)
  }

  test("exactKPerStratum: k smallest hashes per group, window-equivalent, stable") {
    val docs = table("documents")
    val got = Sampling.exactKPerStratum(docs, col("source"), col("doc_id"), k = 7)
      .as[(String, Long)].collect().toSet
    // equals the naive window form on the same total order
    val h = graft.functions.Hashing.h32(col("doc_id").cast("string"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(h, col("doc_id"))
    val ref = docs.select(col("source"), col("doc_id"),
        row_number().over(win).as("rn"))
      .filter(col("rn") <= 7).select(col("source"), col("doc_id"))
      .as[(String, Long)].collect().toSet
    assert(got == ref)
    assert(got.groupBy(_._1).values.forall(_.size == 7))
    // k-minwise stability: growing the corpus never evicts more than
    // the newly-dominated tail — the k=7 sample of a superset agrees
    // with the k=7 sample of the subset on every key whose hash beats
    // the subset's 7th
    val subset = Sampling.exactKPerStratum(
      docs.filter(col("doc_id") % 3 =!= 0), col("source"), col("doc_id"), k = 7)
      .as[(String, Long)].collect().toSet
    assert(got.intersect(subset).size >= 1, "samples should overlap")
    // partial aggregation (the scale contract vs the window form)
    val plan = Sampling.exactKPerStratum(docs, col("source"), col("doc_id"), k = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("upsample: whole copies for all, extra copy for the hash-selected slice") {
    val docs = table("documents")
    val up = Sampling.upsample(docs, col("doc_id"), 1.5)
    val counts = up.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts.keySet.size.toLong == docs.count(), "every doc survives")
    assert(counts.values.forall(n => n == 1 || n == 2))
    val doubled = counts.count(_._2 == 2)
    // ~half the keys get the extra copy
    assert(doubled > counts.size / 4 && doubled < 3 * counts.size / 4)
    // deterministic: the doubled set is repartition-invariant
    val again = Sampling.upsample(docs.repartition(7), col("doc_id"), 1.5)
      .groupBy("doc_id").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(again == counts)
    // integer factor: exactly N copies each, copy_ids 0..N-1
    val x2 = Sampling.upsample(docs.limit(20), col("doc_id"), 2.0)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("copy_id").as("m"))
      .collect()
    x2.foreach { r => assert(r.getLong(1) == 2 && r.getInt(2) == 1) }
  }

  test("mix: weights compose downsample and upsample legs exactly") {
    val docs = table("documents")
    val mixed = Sampling.mix(docs, col("doc_id"), col("source"),
      Map("src0" -> 2.25, "src1" -> 0.5), default = 1.0)
    val bySrc = mixed.groupBy("source", "doc_id").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    // default strata: exactly one copy each
    bySrc.filter(r => r._1 != "src0" && r._1 != "src1")
      .foreach(r => assert(r._3 == 1L))
    // src0 at 2.25: every doc 2 or 3 copies, matching upsample(2.25)
    val src0 = docs.filter(col("source") === "src0")
    val upRef = Sampling.upsample(src0, col("doc_id"), 2.25)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(bySrc.filter(_._1 == "src0").map(r => r._2 -> r._3).toMap == upRef)
    // src1 at 0.5: survivors are exactly sampleFraction(0.5), one copy
    val fracRef = Sampling.sampleFraction(
      docs.filter(col("source") === "src1"), col("doc_id"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    val src1 = bySrc.filter(_._1 == "src1")
    assert(src1.map(_._2).toSet == fracRef)
    assert(src1.forall(_._3 == 1L))
    // weight 0 drops the stratum entirely; determinism under repartition
    assert(Sampling.mix(docs, col("doc_id"), col("source"),
      Map("src0" -> 0.0), default = 1.0)
      .filter(col("source") === "src0").count() == 0)
    val again = Sampling.mix(docs.repartition(7), col("doc_id"), col("source"),
      Map("src0" -> 2.25, "src1" -> 0.5), default = 1.0)
      .groupBy("source", "doc_id").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    assert(again.sorted.toSeq == bySrc.sorted.toSeq)
  }

  test("packIntoBins: greedy fill matches a hand-computed single bucket") {
    // buckets=1 puts everything in bucket 0; cum-before 0,10,30,60,100
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L))
      .toDF("doc_id", "n_tokens")
    val bins = Packing.packIntoBins(docs, col("doc_id"), col("n_tokens"),
        budget = 50L, buckets = 1)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("packIntoBins on real docs: bins are the greedy cumsum fill per bucket") {
    val counts = graft.text.TextAnalysis.tokenCounts(table("documents"), col("text"))
    val packed = Packing.packIntoBins(counts, col("doc_id"), col("bpe_tokens"),
        budget = 2000L, buckets = 4)
      .select("bucket", "doc_id", "n_tokens", "bin")
      .as[(Long, Long, Long, Long)].collect()
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, toks, bin) =>
        assert(bin == cum / 2000L, s"bin must be floor(tokens_before/budget)")
        cum += toks
      }
    }
    assert(packed.map(_._1).distinct.length > 1, "multiple buckets in play")
  }

  test("strideInterleave: every prefix holds each stratum near its share") {
    val docs = table("documents")
    val ord = Sampling.strideInterleave(docs, col("doc_id"), col("source"),
        epoch = 1)
      .orderBy("order_key", "stratum", "doc_id")
      .select("stratum").as[String].collect()
    val n = ord.length
    assert(n === docs.count())
    val shares = ord.groupBy(identity).view.mapValues(_.length.toDouble / n)
    // stride scheduling's lag bound: stratum s appears in any prefix T
    // floor/ceil of T·w_s times (within 1 item per stratum)
    Seq(n / 10, n / 4, n / 2).foreach { t =>
      val prefix = ord.take(t).groupBy(identity).view.mapValues(_.length)
      shares.foreach { case (s, w) =>
        val got = prefix.getOrElse(s, 0)
        assert(math.abs(got - t * w) <= 1.0 + 1e-9,
          s"prefix $t: stratum $s has $got vs expected ${t * w}")
      }
    }
    // per-epoch reshuffle: a different epoch yields a different
    // within-stratum order but the identical prefix-share property
    val ord2 = Sampling.strideInterleave(docs, col("doc_id"), col("source"),
        epoch = 2)
      .orderBy("order_key", "stratum", "doc_id")
      .select("doc_id").as[Long].collect()
    val ord1Ids = Sampling.strideInterleave(docs, col("doc_id"), col("source"),
        epoch = 1)
      .orderBy("order_key", "stratum", "doc_id")
      .select("doc_id").as[Long].collect()
    assert(!ord1Ids.sameElements(ord2), "epochs must permute the order")
    assert(ord1Ids.sorted.sameElements(ord2.sorted), "same corpus either way")
  }

  test("packReport: one-row efficiency stats match the hand-packed bins") {
    // same bins as the hand case above: bin0 = {10,20,30} (60 tokens,
    // fill 1.2), bin1 = {40} (0.8), bin2 = {50} (1.0)
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L))
      .toDF("doc_id", "n_tokens")
    val r = Packing.packReport(docs, col("doc_id"), col("n_tokens"),
      budget = 50L, buckets = 1).collect().head
    assert(r.getLong(0) === 3L, "n_bins")
    assert(r.getLong(1) === 5L, "n_docs")
    assert(r.getLong(2) === 150L, "total_tokens")
    assert(r.getDouble(3) === 1.666667, "mean_docs_per_bin")
    assert(r.getDouble(4) === 1.0, "mean_fill = 150/(3*50)")
    assert(r.getDouble(5) === 0.8, "min_fill")
    assert(r.getDouble(6) === 1.2, "max_fill (jumbo-straddle bin)")
    assert(r.getDouble(7) === 0.0, "waste_frac clamps at 0 when full")
  }

  test("chunk: overlapping windows, short tail, empty doc") {
    // 10 tokens, chunkSize 4, overlap 2 -> starts 0,2,4,6,8
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = Packing.chunk(docs, col("doc_id"), col("text"),
        chunkSize = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.filter(_._1 == 1L).map(_._4).toSeq == Seq(
      "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9", "t8 t9"))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2L, "a b")))
    assert(!out.exists(_._1 == 3L), "empty docs produce no chunks")
    // every chunk except a doc's last has exactly chunkSize tokens
    out.groupBy(_._1).foreach { case (_, rows) =>
      rows.init.foreach(r => assert(r._3 == 4L))
    }
  }

  test("kmeans: one iteration matches hand-computed cosine assignment + means") {
    // seeds = two smallest vec_ids = v1 (1,0) and v2 (0,1);
    // v3 (0.8,0.6) → v1 (cos .8 > .6), v4 (0.6,0.8) → v2;
    // means: c1 = (0.9, 0.3), c2 = (0.3, 0.9)
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.8, 0.6)), (4L, Seq(0.6, 0.8)))
      .toDF("vec_id", "embedding")
    val cents = KMeans.lloyd(vecs, k = 2, iters = 1)
      .as[(Long, Int, Double)].collect()
      .map { case (c, d, v) => (c, d) -> v }.toMap
    assert(cents == Map(
      (1L, 0) -> 0.9, (1L, 1) -> 0.3,
      (2L, 0) -> 0.3, (2L, 1) -> 0.9))
  }

  test("kmeans: an empty cluster carries its seed centroid forward") {
    // seeds = v1 (1,0), v2 (1,0), v3 (0,1); v2 ties c1/c2 and the
    // tiebreak sends it to c1, so cluster 2 is empty and must keep its
    // seed; v4 (0.6,0.8) goes to c3
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.6, 0.8)))
      .toDF("vec_id", "embedding")
    val cents = KMeans.lloyd(vecs, k = 3, iters = 1)
      .as[(Long, Int, Double)].collect()
      .map { case (c, d, v) => (c, d) -> v }.toMap
    assert(cents.size == 3 * 2, "k×dims rows even with an empty cluster")
    assert(cents == Map(
      (1L, 0) -> 1.0, (1L, 1) -> 0.0,
      (2L, 0) -> 1.0, (2L, 1) -> 0.0, // carried seed
      (3L, 0) -> 0.3, (3L, 1) -> 0.9))
  }

  test("kmeans assign: hand-computed nearest centroid, smallest-id tiebreak") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.8, 0.6)), (4L, Seq(0.6, 0.8)))
      .toDF("vec_id", "embedding")
    // trained centroids: c1 = (0.9, 0.3), c2 = (0.3, 0.9)
    val cents = KMeans.lloyd(vecs, k = 2, iters = 1)
    val got = KMeans.assign(vecs, cents)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 1L, 2L -> 2L, 4L -> 2L))
    // (0.6, 0.6) is exactly equidistant from the two (mirror-image)
    // centroids -> the tie must break to the smaller cent_id
    val tied = Seq((9L, Seq(0.6, 0.6))).toDF("vec_id", "embedding")
    assert(KMeans.assign(tied, cents)
      .as[(Long, Long)].collect().head._2 == 1L)
  }

  test("cluster-balanced sample (x16): <= k per cluster, members only") {
    val emb = table("embeddings")
    val asg = KMeans.assign(emb, KMeans.lloyd(emb, k = 8, iters = 2))
      .cache()
    val sample = Sampling.exactKPerStratum(
      asg, col("cent_id"), col("vec_id"), k = 5)
    val perCluster = sample.groupBy("stratum").count()
      .as[(Long, Long)].collect().toMap
    assert(perCluster.values.forall(_ <= 5), "no cluster exceeds k")
    assert(perCluster.values.exists(_ == 5), "full clusters contribute k")
    // every sampled id really belongs to the cluster it represents
    val wrong = sample.join(asg,
      sample("kept_id") === asg("vec_id") &&
        sample("stratum") =!= asg("cent_id")).count()
    assert(wrong === 0L)
    asg.unpersist(): Unit
  }

  test("kmeans on real embeddings: k×dims deterministic rows") {
    val emb = table("embeddings")
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val a = KMeans.lloyd(emb, k = 4, iters = 2)
      .as[(Long, Int, Double)].collect().sorted.toSeq
    assert(a.length == 4 * dims)
    assert(a.map(_._1).distinct.size == 4)
    val b = KMeans.lloyd(emb.repartition(7), k = 4, iters = 2)
      .as[(Long, Int, Double)].collect().sorted.toSeq
    assert(a == b, "centroids must be partition-order independent")
  }
}
