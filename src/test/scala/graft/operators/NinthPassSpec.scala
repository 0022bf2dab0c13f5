package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ann.Knn
import graft.dedup.DupClusters
import graft.text.TextAnalysis

/** Ninth-pass operators: LIX readability (t25), temperature-scaled
  * mixture weights (x12), Gini concentration (g35), kNN graph (e16),
  * rerank cascade (e17), best-copy keeper (d18). */
class NinthPassSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("readability: hand-counted LIX, long words need >6 chars") {
    // "Seven little words in the first sentence. Extraordinary
    // compound!" — 9 words, 2 sentences, long words (>6 chars):
    // "sentence." (9), "Extraordinary" (13), "compound!" (9) = 3
    val df = Seq((1L,
      "Seven little words in the first sentence. Extraordinary compound!"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, col("doc_id"), col("text"))
      .collect().head
    assert(r.getLong(1) === 9L, "n_words")
    assert(r.getLong(2) === 2L, "n_sentences")
    assert(r.getLong(3) === 3L, "n_long_words")
    val lix = 9.0 / 2.0 + 100.0 * 3.0 / 9.0
    assert(r.getDouble(4) === math.rint(lix * 1e6) / 1e6)
  }

  test("readability: empty doc divides by the floor, not by zero") {
    val r = TextAnalysis.readability(Seq((1L, "")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect().head
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
    assert(r.getDouble(4) === 0.0)
  }

  test("temperatureWeights: sqrt smoothing boosts the minority stratum") {
    // 8 a's + 2 b's: p = .8/.2, √p renormalized → b's share rises
    // from .2 to √.2/(√.8+√.2) while the mix still favors a
    val df = (1 to 8).map(i => (i.toLong, "a")) ++ Seq((9L, "b"), (10L, "b"))
    val out = Sampling.temperatureWeights(
        df.toDF("doc_id", "lang"), col("lang"), alpha = 0.5)
      .orderBy("stratum").collect()
    val Seq(a, b) = out.toSeq
    assert(a.getString(0) === "a" && b.getString(0) === "b")
    assert(a.getDouble(2) === 0.8 && b.getDouble(2) === 0.2)
    val sa = BigDecimal(math.sqrt(0.8)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val sb = BigDecimal(math.sqrt(0.2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val den = (sa + sb).toDouble
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(a.getDouble(3) === r6(sa.toDouble / den))
    assert(b.getDouble(3) === r6(sb.toDouble / den))
    // shares still sum to ~1 and the boost direction is right
    assert(b.getDouble(4) > 1.0 && a.getDouble(4) < 1.0)
    assert(math.abs(a.getDouble(3) + b.getDouble(3) - 1.0) < 2e-6)
  }

  test("giniConcentration: even split is 0, max-concentration is (n-1)/n") {
    val df = Seq(
      ("even", 1L, 5.0), ("even", 2L, 5.0), ("even", 3L, 5.0),
      ("onehot", 1L, 0.0), ("onehot", 2L, 0.0), ("onehot", 3L, 12.0))
      .toDF("grp", "mem", "amt")
    val out = Measures.giniConcentration(df, col("grp"), col("mem"),
        col("amt")).orderBy("grp").collect()
    val Seq(even, onehot) = out.toSeq
    assert(even.getDouble(3) === 0.0)
    assert(even.getLong(1) === 3L && even.getDouble(2) === 15.0)
    // x = [0, 0, 12]: G = (2·(3·12) − 4·12) / (3·12) = 24/36
    assert(onehot.getDouble(3) === math.rint(24.0 / 36.0 * 1e6) / 1e6)
  }

  test("giniConcentration: zero-total group yields null, not NaN") {
    val df = Seq(("z", 1L, 0.0), ("z", 2L, 0.0)).toDF("grp", "mem", "amt")
    val r = Measures.giniConcentration(df, col("grp"), col("mem"),
      col("amt")).collect().head
    assert(r.isNullAt(3))
  }

  test("giniConcentration: per-member totals aggregate before ranking") {
    // two rows for member 1 must first sum to 6 — making the group
    // perfectly even with member 2's single 6
    val df = Seq(("g", 1L, 2.0), ("g", 1L, 4.0), ("g", 2L, 6.0))
      .toDF("grp", "mem", "amt")
    val r = Measures.giniConcentration(df, col("grp"), col("mem"),
      col("amt")).collect().head
    assert(r.getLong(1) === 2L && r.getDouble(3) === 0.0)
  }

  test("histogram: equi-width bins, max value clamps into the last bin") {
    val df = Seq(0.0, 1.0, 4.0, 5.0, 9.0, 10.0).map(Tuple1(_)).toDF("v")
    val out = Profiler.histogram(df, col("v"), nBins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // lo=0, hi=10, width=5: [0,5) holds 0,1,4; [5,10) holds 5,9 and
    // the clamped max value 10
    assert(out.toSeq === Seq((0L, 0.0, 5.0, 3L), (1L, 5.0, 10.0, 3L)))
  }

  test("histogram invariants hold over seeded random data") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 50 + rnd.nextInt(200)
      val vals = Seq.fill(n)(rnd.nextDouble() * 1000 - 500)
      val bins = 2 + rnd.nextInt(14)
      val out = Profiler.histogram(vals.map(Tuple1(_)).toDF("v"),
        col("v"), bins).collect()
      assert(out.map(_.getLong(3)).sum === n.toLong, "mass conserved")
      assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) < bins),
        "bin indexes in range")
      assert(out.forall(r => r.getDouble(1) < r.getDouble(2)),
        "bin bounds ordered")
    }
  }

  test("histogram: degenerate min==max corpus lands in bin 0") {
    val df = Seq(7.0, 7.0, 7.0).map(Tuple1(_)).toDF("v")
    val out = Profiler.histogram(df, col("v"), nBins = 4).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 0L && out.head.getLong(3) === 3L)
  }

  test("perplexityBuckets: terciles split a 3-level surprisal corpus") {
    // three surprisal levels, 4 docs each (a: ctf 24, b: ctf 8,
    // uniques: ctf 1) — the interpolated tercile bounds land strictly
    // BETWEEN the levels, so head/middle/tail are the three groups
    val docs = ((1 to 4).map(i => (i.toLong, "a a a a a a")) ++
      (5 to 8).map(i => (i.toLong, "b b")) ++
      (9 to 12).map(i => (i.toLong, s"u${i}x u${i}y")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.map(_._2._1).sum === 12L, "every doc bucketed exactly once")
    assert(out("head") === (4L, 24L), "low-surprisal docs + their token mass")
    assert(out("middle") === (4L, 8L))
    assert(out("tail") === (4L, 8L))
  }

  test("knnGraph: no self-pairs, cluster structure respected, k bounded") {
    // two tight clusters far apart: every vector's rank-1 neighbor
    // must come from its own cluster, and no row pairs a vector
    // with itself
    val emb = Seq(
      (1L, vec(1, 0.01)), (2L, vec(1, 0.02)), (3L, vec(0.99, 0.015)),
      (10L, vec(-0.01, 1)), (11L, vec(-0.02, 1)), (12L, vec(-0.015, 0.99)))
      .toDF("vec_id", "embedding")
    val g = Knn.knnGraph(emb, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(!g.exists { case (q, _, n) => q == n }, "self-pair leaked")
    assert(g.groupBy(_._1).forall(_._2.length <= 2), "k bound")
    val top1 = g.filter(_._2 == 1).map { case (q, _, n) => (q, n) }.toMap
    top1.foreach { case (q, n) =>
      assert((q < 10) === (n < 10), s"$q's nearest $n crossed clusters")
    }
  }

  test("knnGraph equals self lshTopK with the self-match dropped") {
    val emb = (0L until 40L).map(i =>
      (i, vec(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1))))
      .toDF("vec_id", "embedding")
    val got = Knn.knnGraph(emb, k = 3).collect().map(_.toString).sorted
    // same candidates (identical buckets), same (sim desc, id) order:
    // drop self rows from a k+1 self-search and recompute ranks
    val w = Window.partitionBy("query_id").orderBy("rank")
    val want = Knn.lshTopK(emb, emb, k = 4)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank2", row_number().over(w))
      .filter(col("rank2") <= 3)
      .select(col("query_id"), col("rank2").cast("int").as("rank"),
        col("neighbor_id"), col("sim"))
      .collect().map(_.toString).sorted
    assert(got.sameElements(want))
  }

  test("knnGraph auto-sizes planes to hold bucket occupancy " +
    "(the 100x-caller cliff closed)") {
    // the integer derivation: floor at 4, then ceil(log2(n/32))
    assert(Knn.derivePlanes(0L) === 4)
    assert(Knn.derivePlanes(1L) === 4)
    assert(Knn.derivePlanes(512L) === 4)   // 512/32 = 16 -> log2 = 4
    assert(Knn.derivePlanes(513L) === 5)   // just past the boundary
    assert(Knn.derivePlanes(1024L) === 5)
    assert(Knn.derivePlanes(12800L) === 9) // sf0.1-ish: ceil(log2(400))
    assert(Knn.derivePlanes(1L << 40) === 35, "exact powers stay exact")
    // occupancy target respected: n / 2^planes <= 32 whenever derived
    for (n <- Seq(100L, 5000L, 123457L, 999999L)) {
      val p = Knn.derivePlanes(n)
      assert(n.toDouble / (1L << p) <= 32.0, s"occupancy violated at n=$n")
    }
    // the default delegates to the pinned form at the derived count
    val emb = (0L until 90L).map(i =>
      (i, vec(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1))))
      .toDF("vec_id", "embedding")
    val auto = Knn.knnGraph(emb, k = 2).collect().map(_.toString).sorted
    val pinned = Knn.knnGraphAt(emb, k = 2,
        planes = Knn.derivePlanes(90L)).collect().map(_.toString).sorted
    assert(auto.sameElements(pinned))
  }

  test("occupancy guard: natural corpus path is byte-identical; " +
    "duplicate-heavy corpus routes to the IVF-cell graph") {
    // natural corpus (the auto-sized plan's happy path): the guard
    // must return EXACTLY knnGraph's rows — same core over the same
    // frames, the measurement pass changes nothing
    val nat = (0L until 90L).map(i =>
      (i, vec(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1))))
      .toDF("vec_id", "embedding")
    val guarded = Knn.knnGraphGuarded(nat, k = 2).collect().map(_.toString).sorted
    val plain = Knn.knnGraph(nat, k = 2).collect().map(_.toString).sorted
    assert(guarded.sameElements(plain), "guarded happy path must be byte-identical")
    // duplicate-heavy corpus: identical vectors share every signature
    // at ANY plane count, so one bucket holds the whole clone mass —
    // the shape derivePlanes cannot see (count-based) and SCALING.md
    // measured going quadratic. 60 clones + a few naturals, guard
    // budget 16 → max occupancy ≥ 60 → must ROUTE, and the routed
    // answer must equal knnGraphIvf at the derived centroid count.
    val dup = ((0L until 60L).map(i => (i, vec(1, 0.01, 0))) ++
      (100L until 110L).map(i => (i, vec(math.sin(i * 0.9),
        math.cos(i * 1.7), math.sin(i * 2.3)))))
      .toDF("vec_id", "embedding")
    val routed = Knn.knnGraphGuarded(dup, k = 2, maxOccupancy = 16L)
      .collect().map(_.toString).sorted
    val ivf = Knn.knnGraphIvf(dup, k = 2,
        nCentroids = Knn.deriveGraphCentroids(70L))
      .collect().map(_.toString).sorted
    assert(routed.sameElements(ivf), "over-budget corpus must route to IVF cells")
    // fail-fast mode: the refuse-don't-ship stance, with the measured
    // occupancy in the message
    val ex = intercept[IllegalStateException] {
      Knn.knnGraphGuarded(dup, k = 2, maxOccupancy = 16L, routeToIvf = false)
    }
    assert(ex.getMessage.contains("exceeds 16"),
      s"message must carry the budget: ${ex.getMessage}")
    assert("occupancy (\\d+)".r.findFirstMatchIn(ex.getMessage)
      .exists(_.group(1).toLong >= 60L),
      s"message must carry the measured occupancy: ${ex.getMessage}")
    // and the same corpus under a deliberate budget raise stays on the
    // LSH path, byte-identical to the unguarded operator
    val kept = Knn.knnGraphGuarded(dup, k = 2, maxOccupancy = 1000L)
      .collect().map(_.toString).sorted
    assert(kept.sameElements(Knn.knnGraph(dup, k = 2).collect().map(_.toString).sorted))
  }

  test("knnGraphGuardedWithReport: the report IS graphOccupancyReport's " +
    "row from the guard's own single measurement, on both route outcomes") {
    val nat = (0L until 90L).map(i =>
      (i, vec(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1))))
      .toDF("vec_id", "embedding")
    val dup = ((0L until 60L).map(i => (i, vec(1, 0.01, 0))) ++
      (100L until 110L).map(i => (i, vec(math.sin(i * 0.9),
        math.cos(i * 1.7), math.sin(i * 2.3)))))
      .toDF("vec_id", "embedding")
    for ((corpus, budget) <- Seq((nat, Knn.DefaultMaxGraphOccupancy),
                                 (dup, 16L))) {
      val (g, rep) = Knn.knnGraphGuardedWithReport(corpus, k = 2,
        maxOccupancy = budget, nCentroids = Some(16))
      // one-pass report == the standalone operator's row at the same
      // budget (same schema, same integers — no second measurement)
      val standalone = Knn.graphOccupancyReport(corpus,
        maxOccupancy = budget).collect().map(_.toString)
      assert(rep.collect().map(_.toString).sameElements(standalone))
      assert(rep.columns.sameElements(Knn.graphOccupancyReport(corpus)
        .columns), "report schema must match graphOccupancyReport")
      // and the graph leg is exactly knnGraphGuarded's
      assert(g.collect().map(_.toString).sorted.sameElements(
        Knn.knnGraphGuarded(corpus, k = 2, maxOccupancy = budget,
          nCentroids = Some(16)).collect().map(_.toString).sorted))
    }
  }

  test("knnGraphLedgered: one decision per run, retry replays the route") {
    import graft.sources.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-graph-ledger").toString
    val dup = ((0L until 60L).map(i => (i, vec(1, 0.01, 0))) ++
      (100L until 110L).map(i => (i, vec(math.sin(i * 0.9),
        math.cos(i * 1.7), math.sin(i * 2.3)))))
      .toDF("vec_id", "embedding")
    val nat = (0L until 90L).map(i =>
      (i, vec(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1))))
      .toDF("vec_id", "embedding")
    // night-1 on the duplicate-heavy corpus: measures, routes to IVF,
    // records the decision
    val r1 = Knn.knnGraphLedgered(dup, k = 2, dir, "night-1",
      maxOccupancy = 16L).collect().map(_.toString).sorted
    assert(r1.sameElements(Knn.knnGraphIvf(dup, k = 2,
      Knn.deriveGraphCentroids(70L)).collect().map(_.toString).sorted))
    val led1 = SnapshotStore.read(spark, dir).get.collect()
    assert(led1.length === 1)
    assert(led1.head.getAs[String]("action") === "ivf")
    assert(led1.head.getAs[Long]("max_occupancy") >= 60L)
    // a RETRY of night-1 replays the recorded route WITHOUT
    // re-measuring: even against a corpus that would pass the budget,
    // night-1 stays IVF (a retry cannot flip route mid-night), and no
    // second row lands
    val retry = Knn.knnGraphLedgered(nat, k = 2, dir, "night-1",
      maxOccupancy = 16L).collect().map(_.toString).sorted
    assert(retry.sameElements(Knn.knnGraphIvf(nat, k = 2,
      led1.head.getAs[Int]("n_centroids")).collect().map(_.toString).sorted))
    assert(SnapshotStore.read(spark, dir).get.count() === 1L)
    // night-2 on the healthy corpus measures fresh, takes the LSH
    // path byte-identically, and appends its own row
    val r2 = Knn.knnGraphLedgered(nat, k = 2, dir, "night-2")
      .collect().map(_.toString).sorted
    assert(r2.sameElements(Knn.knnGraph(nat, k = 2)
      .collect().map(_.toString).sorted))
    val led2 = SnapshotStore.read(spark, dir).get
    assert(led2.count() === 2L)
    assert(led2.filter(col("run_id") === "night-2").head()
      .getAs[String]("action") === "lsh")
  }

  test("tryClaim: exactly one winner, payload readable, permanent") {
    import graft.sources.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-claim").toString
    assert(SnapshotStore.claimPayload(dir, "t1").isEmpty)
    assert(SnapshotStore.tryClaim(dir, "t1", "payload-A"))
    assert(!SnapshotStore.tryClaim(dir, "t1", "payload-B"),
      "second claim must lose")
    assert(SnapshotStore.claimPayload(dir, "t1").contains("payload-A"),
      "the WINNER's payload is the one readable")
    // distinct tokens are independent
    assert(SnapshotStore.tryClaim(dir, "t2", "other"))
    intercept[IllegalArgumentException] {
      SnapshotStore.tryClaim(dir, "bad/token", "x")
    }
  }

  test("knnGraphLedgered: a lost/orphaned claim decides the route " +
      "(claim-then-build) and the row self-heals") {
    import graft.sources.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-graph-ledger-claim").toString
    val nat = (0L until 90L).map(i =>
      (i, vec(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1))))
      .toDF("vec_id", "embedding")
    // simulate a winner that claimed IVF and died BEFORE merging its
    // ledger row: the claim exists, the row does not
    val token = "run_" + "night-9".getBytes("UTF-8")
      .map("%02x".format(_)).mkString
    assert(SnapshotStore.tryClaim(dir, token, Seq(
      "run_id=night-9", "n_vectors=90", "planes=4", "tables=4",
      "max_occupancy=7", "budget=256", "action=ivf", "n_centroids=16")
      .mkString("\n")))
    // the corpus is HEALTHY (its own measurement would say lsh) — but
    // the claimed decision must win: the retry ships IVF and never
    // re-measures its way onto a different route
    val r = Knn.knnGraphLedgered(nat, k = 2, dir, "night-9")
      .collect().map(_.toString).sorted
    assert(r.sameElements(Knn.knnGraphIvf(nat, k = 2, 16)
      .collect().map(_.toString).sorted),
      "claimed route (ivf) must be executed, not the fresh measurement")
    // and the queryable mirror self-healed from the claim payload
    val row = SnapshotStore.read(spark, dir).get
      .filter(col("run_id") === "night-9").collect()
    assert(row.length === 1)
    assert(row.head.getAs[String]("action") === "ivf")
    assert(row.head.getAs[Long]("max_occupancy") === 7L)
    assert(row.head.getAs[Int]("n_centroids") === 16)
    // a later retry replays from the healed row (the prior-row path)
    val r2 = Knn.knnGraphLedgered(nat, k = 2, dir, "night-9")
      .collect().map(_.toString).sorted
    assert(r2.sameElements(r))
    assert(SnapshotStore.read(spark, dir).get.count() === 1L)
  }

  test("graphOccupancyReport: exact bucket stats and the over flag") {
    // 60 clones in one signature + 10 naturals: per table, the clone
    // bucket holds 60 rows, so max_occupancy >= 60 and candidate_rows
    // >= 4 * 60*59 (the clone bucket's self-join bill in each of the
    // 4 tables); over_budget flips with the budget
    val dup = ((0L until 60L).map(i => (i, vec(1, 0.01, 0))) ++
      (100L until 110L).map(i => (i, vec(math.sin(i * 0.9),
        math.cos(i * 1.7), math.sin(i * 2.3)))))
      .toDF("vec_id", "embedding")
    val r = Knn.graphOccupancyReport(dup, maxOccupancy = 16L).collect().head
    assert(r.getInt(0) === Knn.derivePlanes(70L), "planes")
    assert(r.getInt(1) === 4, "tables")
    assert(r.getLong(2) === 70L, "n_vectors")
    assert(r.getLong(4) >= 60L, "max_occupancy sees the clone mass")
    assert(r.getLong(5) >= 4L * 60L * 59L, "candidate_rows = sum occ*(occ-1)")
    assert(r.getBoolean(6), "over_budget at budget 16")
    val ok = Knn.graphOccupancyReport(dup, maxOccupancy = 100000L).collect().head
    assert(!ok.getBoolean(6), "under a generous budget the flag clears")
    // exact hand-check: two clones → per table exactly one bucket of
    // occupancy 2, so (4 buckets, max 2, bill 4·2·1 = 8)
    val two = Seq((1L, vec(1, 0.01, 0)), (2L, vec(1, 0.01, 0)))
      .toDF("vec_id", "embedding")
    val s = Knn.graphOccupancyReport(two).collect().head
    assert(s.getLong(3) === 4L, "n_buckets")
    assert(s.getLong(4) === 2L, "max_occupancy")
    assert(s.getLong(5) === 8L, "candidate_rows = sum occ*(occ-1) across tables")
  }

  test("knnGraphIvf: exact twins share a cell and list each other at 1.0") {
    // two triplets of exact copies, far apart, plus noise vectors:
    // identical vectors assign to the same centroid by determinism,
    // so every copy's rank-1 neighbor is a twin at sim 1.0
    val emb = (Seq(1L, 2L, 3L).map((_, vec(1, 0.01, 0))) ++
      Seq(10L, 11L, 12L).map((_, vec(-0.01, 1, 0))) ++
      (20L to 27L).map(i => (i, vec(math.sin(i * 0.9), math.cos(i * 1.7),
        math.sin(i * 2.3))))).toDF("vec_id", "embedding")
    val g = Knn.knnGraphIvf(emb, k = 2, nCentroids = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(!g.exists { case (q, _, n, _) => q == n }, "self-pair leaked")
    assert(g.groupBy(_._1).forall(_._2.length <= 2), "k bound")
    val twins = Set(1L, 2L, 3L, 10L, 11L, 12L)
    twins.foreach { id =>
      val r1 = g.find(r => r._1 == id && r._2 == 1).get
      assert(twins.contains(r1._3) && r1._4 === 1.0,
        s"$id's rank-1 must be a twin at sim 1.0, got $r1")
      assert((id < 10) === (r1._3 < 10), s"$id crossed twin groups")
    }
  }

  test("rerankByCosine: the semantic stage reorders the lexical hits") {
    // hits arrive in lexical order (20, 21, 22); embeddings say the
    // true semantic order for q1 is 22 > 20 > 21
    val hits = Seq((1L, 20L), (1L, 21L), (1L, 22L)).toDF("query_id", "doc_id")
    val emb = Seq(
      (1L, vec(1, 0)), (20L, vec(0.8, 0.6)), (21L, vec(0, 1)),
      (22L, vec(1, 0.05)), (99L, vec(-1, 0)))
      .toDF("vec_id", "embedding")
    val out = Knn.rerankByCosine(hits, emb.filter(col("vec_id") < 10),
        emb.filter(col("vec_id") >= 10), k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, 22L), (2, 20L)))
    // doc 99 never scored: it was not in the candidate list
  }

  test("anomalousDays: spike z-scores against the trailing week, short history drops") {
    def d(day: Int) = java.sql.Date.valueOf(f"2024-03-$day%02d")
    // 7 baseline days (10/12 alternating) then a 100 spike; a second
    // group gets a tame day 8 instead
    val rows =
      (1 to 7).map(i => ("spiky", d(i), if (i % 2 == 1) 10.0 else 12.0)) ++
      Seq(("spiky", d(8), 100.0)) ++
      (1 to 7).map(i => ("calm", d(i), if (i % 2 == 1) 10.0 else 12.0)) ++
      Seq(("calm", d(8), 11.0))
    val out = Measures.anomalousDays(rows.toDF("grp", "day", "v"),
        col("grp"), col("day"), col("v"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getDouble(4),
        r.getBoolean(5)))
    // only day 8 has a full 7-day baseline in either group
    assert(out.length === 2)
    val mean = 76.0 / 7
    val vr = (832.0 - 76.0 * 76.0 / 7) / 6
    def z(x: Double) = math.rint((x - mean) / math.sqrt(vr) * 1e6) / 1e6
    val byGrp = out.map(r => r._1 -> r).toMap
    assert(byGrp("spiky")._3 === z(100.0) && byGrp("spiky")._4)
    assert(byGrp("calm")._3 === z(11.0) && !byGrp("calm")._4)
  }

  test("anomalousDays: constant baseline yields null z, never a flag") {
    def d(day: Int) = java.sql.Date.valueOf(f"2024-03-$day%02d")
    val rows = (1 to 7).map(i => ("g", d(i), 10.0)) :+ (("g", d(8), 99.0))
    val r = Measures.anomalousDays(rows.toDF("grp", "day", "v"),
      col("grp"), col("day"), col("v")).collect().head
    assert(r.isNullAt(4) && !r.getBoolean(5))
  }

  test("schema drift audit: added/removed/type/nullability, empty = green") {
    import org.apache.spark.sql.types._
    val declared = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType), StructField("note", StringType)))
    val batch = StructType(Seq(
      StructField("id", LongType, nullable = true),     // loosened
      StructField("amount", StringType),                // retyped
      StructField("extra", IntegerType)))               // note gone, extra new
    val out = graft.sources.SchemaDrift.audit(spark, declared, batch)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("id", "nullability_changed"),
      ("amount", "type_changed"), ("note", "removed"), ("extra", "added")))
    assert(graft.sources.SchemaDrift.audit(spark, declared, declared)
      .count() === 0L)
  }

  test("splitLeakageAudit: straddling pairs flag, within-split pairs don't") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val assign = Seq((1L, "train"), (2L, "test"),   // straddles
      (3L, "train"), (4L, "train"),                 // clean
      (5L, "test"), (6L, "train"))                  // straddles, reversed
      .toDF("doc_id", "split")
    val out = Sampling.splitLeakageAudit(pairs, assign)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSet
    // both straddle orientations canonicalize into ONE leaked row
    assert(out === Set(("test", "train", 2L, true),
      ("train", "train", 1L, false)))
  }

  test("corpusReport: cross-source mirrors count as dups in BOTH sources") {
    val docs = Seq(
      (1L, "a b c", "en", "A"), (2L, "x y z", "de", "A"),
      (3L, "a b c", "en", "B"), (4L, "p q", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
    val out = graft.LlmCuration.corpusReport(docs, col("doc_id"),
        col("text"), col("source"), col("lang"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(6), r.getDouble(7)))
    val Seq(a, b) = out.toSeq
    assert(a === ("A", 2L, 2L, 1L, 6L, 3.0, 0.5))
    assert(b === ("B", 2L, 1L, 1L, 5L, 2.5, 0.5))
  }

  test("bestKeepers: longest doc wins, ties break to the lowest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq((1L, 50L), (2L, 90L), (3L, 90L), (7L, 10L), (9L, 10L))
      .toDF("doc_id", "n_chars")
    val out = DupClusters.bestKeepers(clusters, docs, col("doc_id"),
        col("n_chars")).orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 3L, 2L, 90L), (7L, 2L, 7L, 10L)))
  }

  test("mmrRerank: pool-driven re-rank trades redundancy for diversity") {
    // q=(1,0); n11/n12 are near-duplicates both highly relevant, n13
    // is moderately relevant but diverse. At λ=0.3 the redundancy
    // penalty dominates: slot 2 must go to the diverse n13 even though
    // the pool ranks the duplicate n12 higher.
    val emb = Seq(
      (1L, vec(1.0, 0.0)),
      (11L, vec(1.0, 0.05)),
      (12L, vec(1.0, 0.06)),
      (13L, vec(0.4, 0.9))).toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 1)
    val corpus = emb.filter(col("vec_id") > 1)
    val pool = Knn.bruteForceTopK(queries, corpus, k = 3)
    val out = Knn.mmrRerank(pool, corpus, k = 2, lambda = 0.3)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, 11L), (2, 13L)))
    // the refactor is behavior-preserving: mmrTopK (brute pool inside)
    // agrees with the explicit pool composition
    val direct = Knn.mmrTopK(queries, corpus, k = 2, poolSize = 3,
        lambda = 0.3)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(direct.toSeq === out.toSeq)
  }

  test("bestKeepers: fractional qualities rank at native precision") {
    // a [0,1] quality score must NOT truncate to 0-for-everyone (which
    // would silently degrade best-copy to keep-lowest-id): doc 3's
    // 0.91 beats doc 1's 0.90, and keeper_quality reports the double
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq((1L, 0.90), (2L, 0.15), (3L, 0.91))
      .toDF("doc_id", "quality_score")
    val out = DupClusters.bestKeepers(clusters, docs, col("doc_id"),
        col("quality_score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 3L, 3L, 0.91)))
  }
}
