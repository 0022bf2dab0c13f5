package graft

import org.apache.spark.sql.functions._

/** SQL registration surface: the custom kernels callable from SQL. */
class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions compute the same values as the API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((Array(1.0, 2.0), Array(3.0, 4.0), "The quick brown fox jumps"))
      .toDF("a", "b", "text").createOrReplaceTempView("gf")
    val r = spark.sql(
      """SELECT graft_dot(a, b) AS d,
        |       graft_word_shingles(text, 3) AS sh,
        |       graft_h32_array(graft_word_shingles(text, 3)) AS hs,
        |       graft_minhash_sig(graft_h32_array(graft_word_shingles(text, 3))) AS sig,
        |       graft_simhash64(split(lower(text), ' ')) AS sim,
        |       graft_rolling_hash(split(lower(text), ' ')) AS rh,
        |       graft_lsh_bucket(a, 2) AS bkt,
        |       graft_byte_window_sums(cast(text AS BINARY), 4) AS bws
        |FROM gf""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getSeq[String](1) ==
      Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    assert(r.getSeq[Long](2).length == 3)
    assert(r.getSeq[Long](3).length == graft.dedup.TextDedup.MinHashA.length)
    assert(r.getString(4).length == 16 && r.getString(4).matches("[0-9a-f]+"))
    assert(r.getLong(5) != 0L)
    assert(r.getString(6).matches("[01]{2}"), "2-plane sign bucket")
    assert(r.getSeq[Double](7).length == 4 &&
      r.getSeq[Double](7).sum ==
        "The quick brown fox jumps".getBytes.map(_ & 0xff).sum.toDouble)
    // cross-check against the Column API on the same data
    val api = spark.table("gf").select(
      graft.functions.Vectors.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(api == 11.0)
  }

  test("extensions class injects the same registry entries") {
    // the builder list is shared; spot-check identity of the surface
    assert(GraftFunctions.all.map(_._1.funcName).sorted ==
      Seq("graft_bit_spread", "graft_byte_window_means",
        "graft_byte_window_sums", "graft_dot", "graft_freq_items",
        "graft_h32_array", "graft_lsh_bucket", "graft_minhash_sig",
        "graft_nfc", "graft_rolling_hash", "graft_simhash64",
        "graft_sorted_intersect_count", "graft_word_shingles"))
    new GraftExtensions // constructible (config-time entry point)
  }

  test("misra-gries: exact when vocab fits, bounded + complete when it doesn't") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // vocab (3) fits k=8: the summary IS the exact count table
    val small = Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c")
    small.toDF("t").repartition(5).createOrReplaceTempView("mg_small")
    val got = spark.sql(
      "SELECT explode(graft_freq_items(t, 8)) AS e FROM mg_small")
      .select("e.item", "e.est").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 10L, "b" -> 5L, "c" -> 2L))

    // skew with vocab (21) > k (4): the MG guarantee must hold under
    // an adversarial repartition — undercount <= floor(N/(k+1)) and
    // every token above the bound is present
    val n = 1000
    val hot = Seq.fill(n / 2)("hot")
    val tail = (0 until n / 2).map(i => s"t${i % 20}")
    val exact = (hot ++ tail).groupBy(identity).view.mapValues(_.size.toLong).toMap
    (hot ++ tail).toDF("t").repartition(13).createOrReplaceTempView("mg_skew")
    val s = spark.sql(
      "SELECT explode(graft_freq_items(t, 4)) AS e FROM mg_skew")
      .select("e.item", "e.est").as[(String, Long)].collect().toMap
    assert(s.size <= 4)
    val bound = n / 5 // floor(N/(k+1))
    s.foreach { case (t, est) =>
      assert(est <= exact(t) && exact(t) - est <= bound,
        s"$t: est $est vs exact ${exact(t)} breaks the MG bound $bound")
    }
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(s.contains(t), s"heavy item $t (> $bound) missing from summary")
    }
  }

  test("sorted intersect count matches size(array_intersect) on sorted sets") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import org.scalacheck.Gen
    val gen = Gen.listOf(Gen.chooseNum(-50L, 50L))
    val cases = Gen.listOfN(200, Gen.zip(gen, gen)).sample.get
    cases.map { case (a, b) =>
      (a.distinct.sorted.toArray, b.distinct.sorted.toArray)
    }.toDF("a", "b").createOrReplaceTempView("sic")
    val bad = spark.sql(
      """SELECT * FROM sic
        |WHERE graft_sorted_intersect_count(a, b)
        |      <> size(array_intersect(a, b))""".stripMargin).count()
    assert(bad === 0L)
    // interpreted path agrees with codegen
    val one = spark.sql(
      "SELECT graft_sorted_intersect_count(array(1L,3L,9L), array(3L,4L,9L))")
      .collect()(0).getInt(0)
    assert(one === 2)
  }
}
