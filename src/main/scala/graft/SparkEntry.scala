package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._
import graft.sources.{CsvIngest, JsonIngest, Tables}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query is a thin composition of graft library operators over
  * the testdata tables; each has a DuckDB oracle in [[oracleSql]]
  * computing the same result (same column names, engine-independent
  * arithmetic: DECIMAL sums, single IEEE divisions, rounded
  * similarities, total orderings).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Salt = "graft_pii_salt_2024"

  /** The five claim-type analogs for the measure pack (g4): label →
    * o_orderpriority value, mirroring the reference's five
    * CALCULATE-by-type measures. */
  private val PriorityTypes: Seq[(String, String)] = Seq(
    "urgent" -> "1-URGENT", "high" -> "2-HIGH", "medium" -> "3-MEDIUM",
    "notspec" -> "4-NOT SPECIFIED", "low" -> "5-LOW")

  /** DQ rules for the lineitem feed (SURVEY §2 b3). */
  private def lineitemRules: Seq[QualityRules.Rule] = Seq(
    QualityRules.Rule(col("l_quantity") > 45, "ExcessQuantity"),
    QualityRules.Rule(col("l_discount") > 0.08, "HighDiscount"),
    QualityRules.Rule(col("l_tax") > 0.06, "HighTax"),
    QualityRules.Rule(!col("l_returnflag").isin("A", "N"), "UnknownReturnFlag"),
    QualityRules.Rule(!col("l_linestatus").isin("O", "F"), "UnknownLineStatus"))

  /** Shared claims model over the Dates dimension for the g38b/g38c
    * semantic-model requests: orders (with a derived date-typed
    * `o_date` join key — the stored column is a timestamp) related to
    * a generated calendar spanning the corpus, carrying the
    * reference's Year>Month>Day drill hierarchy (Dates.tmdl:109-131)
    * and the [[DatesRole]] the Time Calculation group evaluates
    * through. `amount` is the exact-decimal sum used for time
    * calculations (the running/LY arithmetic stays decimal until the
    * final per-column IEEE cast); `total_amount` is the IEEE-final
    * form regular requests report. */
  private def claimsDatesModel(s: SparkSession, dir: String): SemanticModel = {
    val datesDim = Dimensions.dateDimension(s,
        java.time.LocalDate.of(1994, 1, 1), java.time.LocalDate.of(2002, 12, 31))
      .select(col("Date").as("d_date"), col("Year").as("d_year"),
        col("Month").as("d_month"), col("Day").as("d_day"))
    val fact = t(s, dir, "orders")
      .withColumn("o_date", to_date(col("o_orderdate")))
    SemanticModel(
      fact = fact,
      dimensions = Map(
        "dates" -> Dimension(datesDim,
          factKey = "o_date", dimKey = "d_date",
          hierarchies = Map("calendar" -> Seq("d_year", "d_month", "d_day"))),
        "customer" -> Dimension(t(s, dir, "customer"),
          factKey = "o_custkey", dimKey = "c_custkey")),
      measures = Seq(
        "total_claims" -> count(lit(1)),
        "total_amount" -> Measures.decSum(col("o_totalprice")),
        "amount" -> sum(col("o_totalprice").cast(DecimalType(18, 4)))),
      dates = Some(DatesRole("dates", year = "d_year", month = "d_month")))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("s5_star_join")(spark, "/root/testdata/sf0.001")

  // ----------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = coreQueries ++ LlmEntry.queries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Pipeline -------------------------------------------------- //

    "p1_medallion" -> ((s, dir) => {
      // the full bronze→silver→gold chain as ONE oracle-checked query
      // (Medallion.run mirrors PLclaims_bronze → silver → gold
      // orchestration incl. watermark advance): runs against a FRESH
      // work dir (self-contained per invocation, the e6/e8b pattern),
      // then emits the per-stage run metrics PLUS the gold rollup as
      // gold_<status> rows — layer counts AND end-state values in one
      // deterministic frame. The oracle replays the chain from the
      // orders feed (empty watermark ⇒ the whole feed is the slice).
      // per-JVM discriminator (pid): Verify and Bench may run this
      // entry concurrently on the same sf dir from separate JVMs, and
      // a work path keyed on dir alone would let one rm the other's
      // mid-run silver/gold stores
      val work = s"${System.getProperty("java.io.tmpdir")}/graft_p1_" +
        dir.hashCode.toHexString + "_" +
        ProcessHandle.current().pid().toHexString
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(work))
      val metrics = Medallion.run(s, dir, work)
      val gold = graft.sources.SnapshotStore.read(s, s"$work/gold").get
      metrics.withColumnRenamed("rows", "n")
        .withColumn("amount", lit(null).cast("double"))
        .unionByName(gold.select(
          concat(lit("gold_"), col("status")).as("stage"),
          col("n_claims").as("n"),
          col("total_amount").as("amount")))
    }),

    // ---- Bronze ---------------------------------------------------- //

    "b1_schema_ingest" -> ((s, dir) => {
      // Exercise the schema-enforced permissive ingest path over a CSV
      // render of a deterministic lineitem slice. The render is SETUP,
      // not ingest: it runs once per (tmpdir, sfdir) — keyed on the
      // _SUCCESS marker — so repeated bench passes time only the
      // schema-enforced read+aggregate, not a coalesce(1) file write.
      val csvDir = s"${System.getProperty("java.io.tmpdir")}/graft_b1_${dir.hashCode.toHexString}"
      if (!new java.io.File(csvDir, "_SUCCESS").exists()) {
        t(s, dir, "lineitem").filter(col("l_orderkey") % 97 === 0)
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
      }
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
        StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
        StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
        StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
        StructField("l_shipdate", TimestampType)))
      // cache: Spark disallows queries referencing only the corrupt
      // column on raw CSV (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
      val ingested = CsvIngest.read(s, csvDir, schema).cache()
      ingested.agg(
        sum(when(col(CsvIngest.CorruptCol).isNull, 1L).otherwise(0L)).as("clean_rows"),
        sum(when(col(CsvIngest.CorruptCol).isNotNull, 1L).otherwise(0L)).as("malformed_rows"))
    }),

    "b6_json_ingest" -> ((s, dir) => {
      // the b1 contract on the other bronze feed format: JSON lines,
      // schema-enforced (single pass — no inference scan), PERMISSIVE
      // corrupt capture. The render is SETUP keyed on a marker file;
      // two deterministic bad lines (one unparseable, one
      // type-mismatched) ride in a side file
      val jsonDir = s"${System.getProperty("java.io.tmpdir")}/graft_b6_${dir.hashCode.toHexString}"
      val marker = new java.io.File(jsonDir, "_B6_READY")
      if (!marker.exists()) {
        t(s, dir, "documents").select("doc_id", "lang", "source", "n_chars")
          .coalesce(1).write.mode("overwrite").json(jsonDir)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(jsonDir, "part-badlines.json"),
          "{{this is not json}}\n{\"doc_id\": \"NaN-ish\", \"lang\": 7, \"source\": \"x\", \"n_chars\": \"many\"}\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        marker.createNewFile(): Unit
      }
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType)))
      val ing = JsonIngest.read(s, jsonDir, schema).cache()
      ing.agg(
        sum(when(col(JsonIngest.CorruptCol).isNull, 1L).otherwise(0L)).as("clean_rows"),
        sum(when(col(JsonIngest.CorruptCol).isNotNull, 1L).otherwise(0L)).as("malformed_rows"),
        countDistinct(when(col(JsonIngest.CorruptCol).isNull, col("source"))).as("n_sources"))
    }),

    "b2_dedup_latest" -> ((s, dir) =>
      // desc/desc ordering = maximize (l_shipdate, l_linenumber):
      // agg form partial-aggregates map-side (see Dedup.latestByKeyAgg)
      Dedup.latestByKeyAgg(t(s, dir, "lineitem"), Seq("l_orderkey"),
          struct(col("l_shipdate"), col("l_linenumber")))
        .select("l_orderkey", "l_linenumber", "l_shipdate")),

    "b2b_dedup_latest_naive" -> ((s, dir) => {
      // the NAIVE user form of b2 — row_number().over(orderBy desc)
      // .filter(rn = 1) — shipped through the WindowTopOneRewrite
      // optimizer rule, which turns it into b2's max_by aggregation
      // (EntryPlanSpec asserts the executed plan has no Window exec
      // and partial-aggregates). Proves the rule end-to-end in the
      // driver's correctness gate, not just in unit specs. The rule is
      // registered once at session build (GraftExtensions, wired into
      // the Verify/Bench/Profile mains and the spec session) — NOT
      // mutated into the session here, so running one query never
      // silently changes another's plan; without the registration the
      // query still returns identical rows, just through the window
      // plan.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_shipdate").desc, col("l_linenumber").desc)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    }),

    "b3_quality_rules" -> ((s, dir) =>
      QualityRules.withReasons(t(s, dir, "lineitem"), lineitemRules)
        .filter(length(col(QualityRules.ReasonCol)) > 0)
        .groupBy(col(QualityRules.ReasonCol).as("reason"))
        .agg(count(lit(1)).as("n"))),

    "b4_quarantine_split" -> ((s, dir) => {
      val flagged = QualityRules.withReasons(t(s, dir, "lineitem"), lineitemRules)
      flagged.agg(
        count(lit(1)).as("total_rows"),
        sum(when(length(col(QualityRules.ReasonCol)) === 0, 1L).otherwise(0L)).as("clean_rows"),
        sum(when(length(col(QualityRules.ReasonCol)) > 0, 1L).otherwise(0L)).as("quarantined_rows"))
    }),

    "b5_merge_upsert" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag", "l_shipdate")
      val target = li.filter(col("l_shipdate") < lit("1999-01-01").cast(TimestampType))
        .drop("l_shipdate")
      val source = li.filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampType))
        .withColumn("l_extendedprice", col("l_extendedprice") * 1.1)
        .drop("l_shipdate")
      Merge.upsert(target, source, Seq("l_orderkey", "l_linenumber"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), Measures.decSum(col("l_extendedprice")).as("total"))
    }),

    // ---- Silver ---------------------------------------------------- //

    "s1_dim_extract" -> ((s, dir) => {
      val fact = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      Dimensions.extract(
        fact.join(broadcast(cust), fact("o_custkey") === cust("c_custkey")),
        Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
    }),

    "s2_date_dim" -> ((s, dir) =>
      Dimensions.dateDimension(s,
        java.time.LocalDate.of(2015, 1, 1), java.time.LocalDate.of(2016, 12, 31))),

    "s3_pii_hash" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        Pii.saltedSha256(col("c_custkey"), Salt).as("patient_key"),
        col("c_mktsegment"))),

    "s4_fact_build" -> ((s, dir) =>
      t(s, dir, "orders").select(
          col("o_orderkey").as("claim_id"),
          Pii.saltedSha256(col("o_custkey"), Salt).as("patient_key"),
          col("o_totalprice").as("amount"),
          col("o_orderdate").as("claim_date"),
          col("o_orderstatus").as("status"))
        .dropDuplicates("claim_id")),

    "s5_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_lines"),
          Measures.decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }),

    // ---- Gold ------------------------------------------------------ //

    "s6_scd2_dim" -> ((s, dir) => {
      // SCD Type-2 history of each customer's order status, built
      // INCREMENTALLY: the change feed split at a fixed date, two
      // sequential applyChanges — the result must equal the one-shot
      // chain the oracle computes (batch-boundary no-ops, closes, and
      // interval chaining all exercised through the driver gate)
      val ch = t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate"), col("o_orderkey"))
      val keys = Seq("o_custkey"); val tracked = Seq("o_orderstatus")
      val cut = lit("1998-01-01").cast("timestamp")
      val init = Scd2.empty(ch, keys, tracked, "o_orderdate")
      val after1 = Scd2.applyChanges(init,
        ch.filter(col("o_orderdate") < cut), keys, tracked,
        "o_orderdate", Seq("o_orderkey"))
      Scd2.applyChanges(after1, ch.filter(col("o_orderdate") >= cut),
        keys, tracked, "o_orderdate", Seq("o_orderkey"))
    }),

    "s6b_scd2_asof" -> ((s, dir) => {
      // s6's consumption leg: each fact looks up the customer-status
      // version valid 30 days AFTER its own order date, so the lookup
      // genuinely crosses version boundaries instead of trivially
      // reading back its own change; every 50th order is back-dated
      // ~55 years and must come back with NULL dimension attributes
      // (no version open that early)
      val ch = t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate"), col("o_orderkey"))
      val keys = Seq("o_custkey"); val tracked = Seq("o_orderstatus")
      val dim = Scd2.applyChanges(
        Scd2.empty(ch, keys, tracked, "o_orderdate"),
        ch, keys, tracked, "o_orderdate", Seq("o_orderkey"))
      val fact = ch.select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 50 === 0, date_add(col("o_orderdate"), -20000))
          .otherwise(date_add(col("o_orderdate"), 30)).as("fact_date"))
      Scd2.asOfJoin(fact, "fact_date", dim, keys, tracked)
        .select(col("o_orderkey"), col("o_custkey"), col("fact_date"),
          col("dim_o_orderstatus").as("asof_status"),
          col("dim_effective_from").as("asof_from"))
    }),

    "g1_distinct_domains" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderstatus")).distinct()),

    "g2_staging_projection" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .distinct()),

    "g3_conditional_upsert" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val staging = cust.filter(col("c_custkey") % 3 === 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 10 === 0, col("c_acctbal") + 100).otherwise(col("c_acctbal")))
        .unionByName(
          cust.filter(col("c_custkey") % 50 === 0)
            .withColumn("c_custkey", col("c_custkey") + 1000000))
      Merge.conditionalUpsertMetrics(cust, staging,
        keys = Seq("c_custkey"), compareCols = Seq("c_name", "c_acctbal", "c_mktsegment"))
    }),

    "g4_measure_pack" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val fact = li.join(o, li("l_orderkey") === o("o_orderkey"))
      // all five claim-type analogs (reference: Inpatient/Outpatient/
      // Emergency/Routine/Urgent Care, Claims.tmdl:189-225)
      Measures.measurePack(fact,
        amount = col("l_extendedprice"), status = col("o_orderstatus"),
        typ = col("o_orderpriority"),
        entityA = col("o_custkey"), entityB = col("l_suppkey"),
        statuses = ("F", "O", "P"), types = PriorityTypes)
    }),

    "g13_salted_agg" -> ((s, dir) =>
      // skew-safe two-phase aggregation: l_returnflag has only 3
      // values, the canonical hot-key shape; salting bounds any
      // reducer's share of a key to 1/16 (result identical to the
      // plain groupBy — that's what the oracle checks)
      Skew.saltedSumCount(t(s, dir, "lineitem"), Seq("l_returnflag"),
          col("l_quantity").cast(DecimalType(18, 4)),
          saltFrom = Seq(col("l_orderkey"), col("l_linenumber")), factor = 16)
        .select(col("l_returnflag"), col("total").cast(DoubleType).as("total_qty"),
          col("n"))),

    "g12_dim_avg" -> ((s, dir) =>
      // dim-table measure analog of Patients 'Average Age'
      // (Patients.tmdl:5): a single AVERAGE over the dimension
      t(s, dir, "customer").agg(
        count(lit(1)).as("n_customers"),
        Measures.decAvg(col("c_acctbal")).as("avg_acctbal"))),

    "g14b_sketch_percentiles" -> ((s, dir) => {
      // GK-sketch form of g9's exact percentiles — bounded per-partition
      // summaries instead of a per-group sort. Rows-only at the driver
      // (sketches aren't cross-engine), so the row itself carries the
      // evidence: exact percentiles bracketing each prob by ±0.01 rank
      // (generous vs the 1/accuracy = 1e-4 GK bound) and a boolean
      // per prob that must be true. The exact leg exists only as the
      // checkable invariant — production uses approxPercentiles alone.
      val ap = Measures.approxPercentiles(t(s, dir, "orders"),
        col("o_orderstatus"), col("o_totalprice"), Seq(0.5, 0.9, 0.99))
      val ex = t(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("grp"))
        .agg(expr("percentile(o_totalprice, array(0.49, 0.51, 0.89, 0.91, 0.98, 1.0))")
          .as("exb"))
      ap.join(ex, "grp").select(
        col("grp"), col("p50"), col("p90"), col("p99"),
        col("p50").between(col("exb")(0), col("exb")(1)).as("p50_ok"),
        col("p90").between(col("exb")(2), col("exb")(3)).as("p90_ok"),
        col("p99").between(col("exb")(4), col("exb")(5)).as("p99_ok"))
    }),

    "g14_sketch_distinct" -> ((s, dir) => {
      // HLL++ sketch form of the distinct-count measures — the 100 TB
      // path (fixed-size registers instead of shuffling every value).
      // No DuckDB oracle: HLL estimates aren't cross-engine; the driver
      // records rows/schema, and the row carries its own evidence —
      // the exact counts plus |approx-exact|/exact <= 3*rsd booleans
      // that must be true (MeasuresSpec gates the same bound). The
      // exact leg is the invariant, not the operator: production uses
      // approxDistinctPack alone.
      val o = t(s, dir, "orders").join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      o.agg(
          approx_count_distinct(col("o_custkey"), 0.02).as("unique_patients"),
          approx_count_distinct(col("l_suppkey"), 0.02).as("unique_providers"),
          countDistinct(col("o_custkey")).as("exact_patients"),
          countDistinct(col("l_suppkey")).as("exact_providers"))
        .withColumn("patients_within_bound",
          abs(col("unique_patients") - col("exact_patients"))
            <= col("exact_patients") * 0.06)
        .withColumn("providers_within_bound",
          abs(col("unique_providers") - col("exact_providers"))
            <= col("exact_providers") * 0.06)
    }),

    "g5_measures_by_dim" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"), year(col("o_orderdate")).as("yr"))
        .agg(
          count(lit(1)).as("n_claims"),
          Measures.decSum(col("o_totalprice")).as("total_amount"),
          Measures.decAvg(col("o_totalprice")).as("average_amount"),
          countDistinct(col("o_custkey")).as("unique_patients"))),

    "g6_time_intelligence" -> ((s, dir) =>
      Measures.timeIntelligence(t(s, dir, "orders"), col("o_orderdate"), col("o_totalprice"))),

    "g6b_time_intel_count" -> ((s, dir) =>
      // calculation-group form: the same YTD/QTD/LY/YoY family applied
      // to a DIFFERENT selected measure (claim count, not amount)
      Measures.timeIntelligenceFor(t(s, dir, "orders"), col("o_orderdate"),
        count(lit(1)), "claims")),

    "g7_topn" -> ((s, dir) =>
      Measures.topN(t(s, dir, "orders"), col("o_custkey"), col("o_totalprice"), 10)),

    "g7b_topn_naive" -> ((s, dir) => {
      // the NAIVE user form of g7 — the reference's top-N visual idiom
      // (Health report top-10 providers) written as row_number over a
      // GLOBAL window ordered (total desc, key asc), filter rn <= 10.
      // Mixed directions and no partition keys, so neither the min_by
      // form nor InferWindowGroupLimit's sort-then-limit shape removes
      // the single-partition sort; WindowTopOneRewrite's TopKRows path
      // plans an ungrouped bounded-heap aggregate instead (at most 10
      // rows per mapper cross the wire, nothing sorts) and posexplodes
      // the winners. EntryPlanSpec asserts no Window exec + partial
      // aggregation; semantics == g7, so it shares g7's oracle.
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("total").desc, col("key").asc)
      t(s, dir, "orders")
        .groupBy(col("o_custkey").as("key"))
        .agg(Measures.decSum(col("o_totalprice")).as("total"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("key", "total")
    }),

    "g9_percentile" -> ((s, dir) =>
      // exact linear-interpolation percentiles (R-7, same definition
      // as DuckDB quantile_cont); §6-quantized to absorb fp ordering
      // noise engine-identically (Quantize scaladoc)
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(
          graft.functions.Quantize.qdp(
            expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          graft.functions.Quantize.qdp(
            expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          graft.functions.Quantize.qdp(
            expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))),

    "g10_pivot" -> ((s, dir) =>
      // status matrix a la the report's pivot visuals; explicit value
      // list keeps the plan single-pass (no distinct-values job)
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(Measures.decSum(col("o_totalprice")))),

    "g10b_unpivot" -> ((s, dir) =>
      // the inverse reshape of g10: the pivoted status matrix melted
      // back to (yr, status, total) long form — the wide→long step
      // visual/export layers need; Spark's native unpivot (map-only
      // over the pivoted frame, null cells dropped like melt does)
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(Measures.decSum(col("o_totalprice")))
        .unpivot(Array(col("yr")), Array(col("F"), col("O"), col("P")),
          "status", "total")
        .filter(col("total").isNotNull)),

    "g11_rollup" -> ((s, dir) =>
      // subtotal grid (status × priority → status totals → grand total)
      t(s, dir, "orders")
        .rollup(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          Measures.decSum(col("o_totalprice")).as("total"))),

    "g11b_cube" -> ((s, dir) =>
      // full cross-tab: every grouping-set combination in one pass;
      // grouping_id disambiguates real NULL keys from subtotal rows
      t(s, dir, "orders")
        .cube(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          Measures.decSum(col("o_totalprice")).as("total"))),

    "g16_outliers" -> ((s, dir) =>
      // robust claims-anomaly screen: median/MAD per status, count of
      // amounts beyond 3 scaled MADs — the outlier report a claims
      // auditor reads; median+MAD so the screen isn't dragged by the
      // outliers it hunts
      Measures.robustOutliers(t(s, dir, "orders"),
        col("o_orderstatus"), col("o_totalprice"))),

    "g19_salted_join" -> ((s, dir) =>
      // the skew toolkit's JOIN leg (g13 is the aggregation leg): a
      // deterministically-salted big-big join — hot keys split across
      // `factor` reducers — must produce exactly the plain join;
      // summarized per status so the oracle row set stays small
      Skew.saltedJoin(t(s, dir, "lineitem"),
          t(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"), Seq(col("l_linenumber")), factor = 8)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"),
          Measures.decSum(col("l_extendedprice")).as("total"))),

    "g20_profile" -> ((s, dir) =>
      // table onboarding profile: per-column non-null / exact-distinct
      // counts and native-typed min/max, one aggregation job (multi-
      // distinct Expand, map-side partials) — how the b3 DQ thresholds
      // get chosen before anyone trusts a new feed
      Profiler.profile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag"))),

    "g21_incremental_rollup" -> ((s, dir) => {
      // O(batch) gold refresh: the orders fact lands in two delta
      // batches folded into a per-status additive state (count + exact
      // decimal sum); reading the state after batch 2 must equal the
      // full recompute — the materialized-view-maintenance contract.
      // Self-contained per invocation: prior state is wiped first.
      val state = {
        val raw = s.conf.get("spark.sql.warehouse.dir")
        val uri = new java.net.URI(raw)
        val base = uri.getScheme match {
          case null => raw
          case "file" => java.nio.file.Paths.get(uri).toString
          case other => sys.error(s"local warehouse required, got $other")
        }
        java.nio.file.Paths.get(base,
          "g21_state_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      }
      val root = java.nio.file.Paths.get(state)
      if (java.nio.file.Files.exists(root)) {
        val files = java.nio.file.Files.walk(root)
        try files.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.delete(f))
        finally files.close()
      }
      val orders = t(s, dir, "orders")
      IncrementalAgg.update(orders.filter(col("o_orderkey") % 2 === 0),
        state, Seq("o_orderstatus"), Seq("o_totalprice"))
      IncrementalAgg.update(orders.filter(col("o_orderkey") % 2 =!= 0),
        state, Seq("o_orderstatus"), Seq("o_totalprice"))
      IncrementalAgg.read(s, state).get
        .select(col("o_orderstatus").as("status"), col("n"),
          col("sum_o_totalprice").cast("double").as("total"),
          // §6 quantizer on the mean quotient (Quantize scaladoc)
          graft.functions.Quantize.qdp(
            col("sum_o_totalprice").cast("double") / col("n"), 6)
            .as("avg_price"))
    }),

    "g33_new_vs_returning" -> ((s, dir) =>
      // monthly acquisition split: distinct active customers, first-
      // ever-month news, returning remainder, cumulative distinct —
      // the dashboard complement of g18's retention triangle
      Measures.newVsReturning(t(s, dir, "orders"),
        col("o_custkey"), col("o_orderdate"))),

    "g24_dense_months" -> ((s, dir) =>
      // zero-filled (status, year, month) grid between the fact's
      // first and last month — silent months read as 0 rows, not
      // missing rows (the date-dimension guarantee derived from the
      // fact's own bounds)
      Measures.denseMonthly(t(s, dir, "orders"),
        col("o_orderstatus"), col("o_orderdate"), col("o_totalprice"))),

    "g25_share_of_total" -> ((s, dir) =>
      // % of parent / % of grand total across the status → priority
      // hierarchy — the DIVIDE-rate idiom at every level
      Measures.shareOfTotal(t(s, dir, "orders"),
        col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))),

    "g26_moving_avg" -> ((s, dir) =>
      // 3-month trailing average + running total per status — the
      // smoothing layer over the monthly grain
      Measures.movingAverage(t(s, dir, "orders"),
        col("o_orderstatus"), col("o_orderdate"), col("o_totalprice"))),

    "g27_abc_class" -> ((s, dir) =>
      // Pareto tiers: which customers carry each status's revenue —
      // 80/15/5 cumulative-share classes over the aggregated frame
      Measures.abcClassification(t(s, dir, "orders"),
        col("o_orderstatus"), col("o_custkey"), col("o_totalprice"))),

    "g37_anomaly_days" -> ((s, dir) =>
      // daily-ops alerting: per event type, each day's total vs the
      // trailing-7-day baseline (today excluded), z-scores flagged >3
      Measures.anomalousDays(t(s, dir, "events"), col("event_type"),
        to_date(col("ts")), col("value"))),

    "g38_semantic_eval" -> ((s, dir) => {
      // semantic-model serving: the DAX measure catalog evaluated per
      // request (operators.SemanticModel — Claims.tmdl's COUNTROWS /
      // SUM / CALCULATE / DIVIDE family over relationships.tmdl's
      // star). The request groups by a DIMENSION column under a
      // fact-side slicer, so evaluate() must join (and broadcast)
      // exactly one dimension and push the filter below the agg.
      val model = SemanticModel(
        fact = t(s, dir, "orders"),
        dimensions = Map(
          "customer" -> Dimension(t(s, dir, "customer"),
            factKey = "o_custkey", dimKey = "c_custkey")),
        measures = Seq(
          "total_claims" -> count(lit(1)),
          "total_amount" -> Measures.decSum(col("o_totalprice")),
          "finished_claims" ->
            SemanticModel.calculateCount(col("o_orderstatus") === "F"),
          "finished_amount" -> SemanticModel.calculateSum(
            col("o_totalprice"), col("o_orderstatus") === "F"),
          "finished_rate" -> SemanticModel.divide(
            SemanticModel.calculateCount(col("o_orderstatus") === "F")
              .cast("double"), count(lit(1))),
          "average_amount" -> Measures.decAvg(col("o_totalprice"))))
      model.evaluate(
        groupBy = Seq("c_mktsegment"),
        measureNames = Seq("total_claims", "total_amount",
          "finished_claims", "finished_amount", "finished_rate",
          "average_amount"),
        filters = Seq(year(col("o_orderdate")) >= 1995))
    }),

    "g38b_time_intel_eval" -> ((s, dir) => {
      // the Time Calculation group THROUGH the model (Time
      // Calculation.tmdl:4-24): SELECTEDMEASURE = any catalog measure,
      // the calc-group item = a time variant, evaluated over the
      // declared Dates dimension (Dates.tmdl related on the fact date
      // key). Month grain comes from the dates table's calendar
      // columns — the broadcast dim join adds no shuffle; the only
      // corpus-sized exchange is the month-grain aggregation, and the
      // variant windows run on the ≤#months frame. The measure is a
      // DECIMAL sum so the running/LY arithmetic is exact in both
      // engines (one IEEE cast per output column at the end).
      val model = claimsDatesModel(s, dir)
      model.evaluateTime("amount", Seq("ytd", "ly", "yoy_pct"),
        filters = Seq(col("o_orderstatus").isin("F", "O")))
    }),

    "g38d_time_intel_matrix" -> ((s, dir) => {
      // the matrix visual through the model: a calc-group variant per
      // (dimension cell, month) — YTD and YoY% of the amount measure
      // by month BY customer segment. Each cell is an independent
      // series: the variant windows partition by the cell and the LY
      // lookup matches within it; both dims broadcast, the only
      // corpus-sized exchange is still the (cell, month)-grain agg.
      val model = claimsDatesModel(s, dir)
      model.evaluateTime("amount", Seq("ytd", "yoy_pct"),
        groupBy = Seq("c_mktsegment"),
        filters = Seq(col("o_orderstatus").isin("F", "O")))
    }),

    "g38e_time_intel_drill" -> ((s, dir) => {
      // the calc group composed WITH the drill hierarchy (the
      // reference matrix drills Year>Month while showing YTD/SPLY
      // variants): collapsed-YEAR rows per segment under DAX's
      // year-context semantics — ytd at the year's last observed
      // month (= the year-so-far total), ly/yoy against the FULL
      // previous year, contiguity-guarded. Sub-month drills fail
      // fast. Same single corpus pass; the year fold is an rn=1 cut
      // over the month frame.
      val model = claimsDatesModel(s, dir)
      model.evaluateTime("amount", Seq("mtd", "ytd", "ly", "yoy_pct"),
        groupBy = Seq("c_mktsegment"),
        filters = Seq(col("o_orderstatus").isin("F", "O")),
        drill = Some(("calendar", "d_year")))
    }),

    "g39_topn_model" -> ((s, dir) => {
      // the top-N visual through the model (DAX TOPN over a
      // SUMMARIZE): top-10 customers by the finished-amount measure —
      // grouped by the DIMENSION-side key (either side of the
      // relationship is requestable), cut via TakeOrderedAndProject
      // over the aggregated cells, never a global sort
      val model = claimsDatesModel(s, dir)
      model.evaluateTopN(10, Seq("c_custkey"),
        Seq("total_amount", "total_claims"),
        filters = Seq(col("o_orderstatus") === "F"))
    }),

    "g40_yoy_contribution" -> ((s, dir) =>
      // the waterfall report: which segments drove the latest year's
      // change — per cell, latest vs previous year totals, delta, and
      // share of the total delta (missing years coalesce to 0)
      Measures.yoyContribution(
        t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "left"),
        col("c_mktsegment"), col("o_orderdate"), col("o_totalprice"))),

    "g38c_hierarchy_rollup" -> ((s, dir) => {
      // hierarchy-aware model request (Dates.tmdl:109-131's
      // Year>Month>Day drill hierarchy): ROLLUP across all levels in
      // one pass — every drill prefix plus the grand total, each row
      // tagged with the grouping-set bit vector so subtotal rows are
      // distinguishable from genuinely-null level values. Rides the
      // same broadcast dates join; the rollup is Spark's native
      // expand+agg (g11's machinery) reached as a model request.
      val model = claimsDatesModel(s, dir)
      model.evaluateRollup("dates", "calendar",
        Seq("total_claims", "total_amount"),
        filters = Seq(col("o_orderstatus") === "F"))
    }),

    "g36_histogram" -> ((s, dir) =>
      // distribution shape for the profile: 20 equi-width bins over
      // order totals — one (min,max) broadcast + one map-only
      // classification + one 20-key count
      Profiler.histogram(t(s, dir, "orders"), col("o_totalprice"),
        nBins = 20)),

    "g35_gini" -> ((s, dir) =>
      // concentration in one number per status: the Gini coefficient
      // of customer revenue — g27's Pareto tiers reduced to the scalar
      // a KPI row tracks over time
      Measures.giniConcentration(t(s, dir, "orders"),
        col("o_orderstatus"), col("o_custkey"), col("o_totalprice"))),

    "g28_fk_audit" -> ((s, dir) =>
      // star-schema referential-integrity report over both fact->dim
      // relationships: orphans, null FKs, childless parents
      Profiler.fkAudit(t(s, dir, "orders"), col("o_custkey"),
          t(s, dir, "customer"), col("c_custkey"), "orders->customer")
        .unionByName(Profiler.fkAudit(t(s, dir, "lineitem"), col("l_orderkey"),
          t(s, dir, "orders"), col("o_orderkey"), "lineitem->orders"))),

    "g30_skew_report" -> ((s, dir) =>
      // the heavy-hitter planning report behind g13/g19's salt factor:
      // top-10 hottest event users with exact counts and table share —
      // one map-side-combined keyed count (the same shuffle the
      // prospective join would pay) + a bounded-heap top-k
      Skew.keyShareReport(Tables.loadEvents(s, dir), col("user_id"), k = 10)),

    "g22_winsorize" -> ((s, dir) =>
      // robust totals: amounts clamped into per-status [p05, p95]
      // before summing — the capped counterpart of g16's outlier screen
      Measures.winsorizedStats(t(s, dir, "orders"),
        col("o_orderstatus"), col("o_totalprice"))),

    "g23_event_transitions" -> ((s, dir) =>
      // first-order Markov transition matrix over each user's event
      // timeline: (from, to, n, p) — the path-analysis complement of
      // g17's fixed funnel
      streaming.Events.transitionMatrix(Tables.loadEvents(s, dir))),

    "g31_event_paths" -> ((s, dir) =>
      // top-10 whole user journeys (8-step horizon) — the sequence
      // report next to g23's one-step transition matrix
      streaming.Events.topPaths(Tables.loadEvents(s, dir))),

    "g17_funnel" -> ((s, dir) =>
      // ordered-step conversion funnel over the event log: users who
      // viewed, then clicked at-or-after their first view, then
      // purchased at-or-after that click — per-step reach counts via
      // key-aligned joins + partial-aggregating mins (no windows, no
      // per-user sort)
      streaming.Events.funnel(Tables.loadEvents(s, dir),
        Seq("view", "click", "purchase"))),

    "g32_window_funnel" -> ((s, dir) =>
      // g17 with a 24h per-step conversion deadline (the ClickHouse
      // windowFunnel contract): step i counts only within window OF
      // step i-1 — late conversions drop out of every later step
      // (at sf0.01: 150/60/25 vs the unbounded 150/150/150)
      streaming.Events.windowFunnel(Tables.loadEvents(s, dir),
        Seq("view", "click", "purchase"), windowSeconds = 86400L)),

    "g17b_funnel_latency" -> ((s, dir) =>
      // the latency leg of g17: seconds from each step to the next
      // over the users who converted — n_users, exact decimal mean,
      // exact R-7 p50/p90 (g9's percentile definition)
      streaming.Events.funnelLatency(Tables.loadEvents(s, dir),
        Seq("view", "click", "purchase"))),

    "g18_retention" -> ((s, dir) =>
      // weekly cohort retention triangle: cohort = week of first
      // event; n_users = cohort members active at each week offset.
      // Two keyed shuffles; active weeks collect per user (bounded by
      // calendar weeks, not events)
      streaming.Events.weeklyRetention(Tables.loadEvents(s, dir))),

    "g8_ingestion_log" -> ((s, dir) => {
      // Winner-per-key via max_by over the TOTAL ordering struct (the
      // data has tied (orderkey, shipdate, linenumber) rows whose DQ
      // attributes differ — a partial ordering would make the winner
      // ambiguous; rows tying on ALL ten columns have equal reasons,
      // so max_by ties are harmless). Unlike a row_number window this
      // partial-aggregates map-side: no per-key sort of full rows ever
      // reaches the shuffle — same rewrite that took b2 from 2.5s to
      // 0.6s. Non-winner rows are the duplicates (cnt - 1 per key);
      // the winner's DQ reason decides bad_quality vs clean.
      val li = t(s, dir, "lineitem")
      val ordStruct = struct(col("l_shipdate"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"))
      val flagged = QualityRules.withReasons(li, lineitemRules)
      flagged
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("cnt"),
          max_by(length(col(QualityRules.ReasonCol)) > 0, ordStruct).as("winner_bad"))
        .agg(
          coalesce(sum(col("cnt") - 1), lit(0L)).as("n_dup"),
          coalesce(sum(when(col("winner_bad"), 1L).otherwise(0L)), lit(0L)).as("n_bad"),
          coalesce(sum(when(!col("winner_bad"), 1L).otherwise(0L)), lit(0L)).as("n_clean"))
        .selectExpr(
          """stack(4, 'duplicate', n_dup, 'bad_quality', n_bad,
            |         'clean', n_clean, 'malformed', CAST(0 AS BIGINT))
            |  AS (bucket, n)""".stripMargin)
    }))

  // ----------------------------------------------------------------- //

  /** The b3/b4/g8 DQ rule set as DuckDB SQL (kept in lockstep with
    * [[lineitemRules]]). */
  private val DqReasonSql =
    """coalesce(array_to_string(list_filter([
      |  CASE WHEN l_quantity > 45 THEN 'ExcessQuantity' END,
      |  CASE WHEN l_discount > 0.08 THEN 'HighDiscount' END,
      |  CASE WHEN l_tax > 0.06 THEN 'HighTax' END,
      |  CASE WHEN NOT l_returnflag IN ('A','N') THEN 'UnknownReturnFlag' END,
      |  CASE WHEN NOT l_linestatus IN ('O','F') THEN 'UnknownLineStatus' END
      | ], x -> x IS NOT NULL), ';'), '')""".stripMargin

  def oracleSql: Map[String, String] = coreOracleSql ++ LlmEntry.oracleSql

  /** The §6 presentation quantizer's DuckDB twin (see
    * [[graft.functions.Quantize]]): floor(x·10^6 + 0.5)/10^6 in pure
    * IEEE ops — round(double, n) is engine-dependent at the half
    * boundary (Spark rounds the shortest-decimal repr, DuckDB the
    * binary value), this is not. */
  private def q6(e: String): String = graft.functions.Quantize.qdpSql(e, 6)
  private def q4(e: String): String = graft.functions.Quantize.qdpSql(e, 4)

  private def coreOracleSql: Map[String, String] = Map(

    // p1: the medallion chain replayed from the orders feed — empty
    // watermark ⇒ whole feed; latest-per-claim (keys are unique in
    // this data, but the dedup is replayed anyway), DQ gate, fact =
    // clean (MERGE into empty store), dim = distinct customer
    // attributes, gold = status rollup with the DECIMAL(18,4) sum
    "p1_medallion" ->
      """WITH latest AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY o_orderdate DESC, o_totalprice DESC) AS rn
        |    FROM orders) x WHERE rn = 1),
        |clean AS (SELECT * FROM latest
        |          WHERE NOT (o_totalprice <= 0
        |                     OR o_orderstatus NOT IN ('F','O','P'))),
        |gold AS (SELECT o_orderstatus AS status, count(*) AS n_claims,
        |           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |             AS total_amount
        |         FROM clean GROUP BY 1)
        |SELECT 'fresh_rows' AS stage,
        |       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n,
        |       CAST(NULL AS DOUBLE) AS amount
        |UNION ALL SELECT 'clean_rows',
        |       (SELECT count(*) FROM clean), NULL
        |UNION ALL SELECT 'quarantined_rows',
        |       (SELECT count(*) FROM latest) - (SELECT count(*) FROM clean), NULL
        |UNION ALL SELECT 'fact_rows', (SELECT count(*) FROM clean), NULL
        |UNION ALL SELECT 'dim_rows',
        |       (SELECT count(*) FROM (SELECT DISTINCT c_custkey, c_name,
        |                              c_mktsegment FROM customer) d), NULL
        |UNION ALL SELECT 'gold_rows', (SELECT count(*) FROM gold), NULL
        |UNION ALL SELECT 'gold_' || status, n_claims, total_amount FROM gold""".stripMargin,

    "b1_schema_ingest" ->
      """SELECT count(*) AS clean_rows, CAST(0 AS BIGINT) AS malformed_rows
        |FROM lineitem WHERE l_orderkey % 97 = 0""".stripMargin,

    // the two bad lines are constants of the query's own side file
    "b6_json_ingest" ->
      """SELECT count(*) AS clean_rows, CAST(2 AS BIGINT) AS malformed_rows,
        |       count(DISTINCT source) AS n_sources
        |FROM documents""".stripMargin,

    "b2_dedup_latest" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM (
        |  SELECT l_orderkey, l_linenumber, l_shipdate,
        |         row_number() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,

    // b2b is the rewrite-rule form of b2: identical semantics by the
    // rule's value-identity contract, so the oracle is b2's
    "b2b_dedup_latest_naive" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM (
        |  SELECT l_orderkey, l_linenumber, l_shipdate,
        |         row_number() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,

    "b3_quality_rules" ->
      s"""WITH flagged AS (SELECT $DqReasonSql AS reason FROM lineitem)
         |SELECT reason, count(*) AS n FROM flagged WHERE reason <> '' GROUP BY reason""".stripMargin,

    "b4_quarantine_split" ->
      s"""WITH flagged AS (SELECT $DqReasonSql AS reason FROM lineitem)
         |SELECT count(*) AS total_rows,
         |       CAST(sum(CASE WHEN reason = '' THEN 1 ELSE 0 END) AS BIGINT) AS clean_rows,
         |       CAST(sum(CASE WHEN reason <> '' THEN 1 ELSE 0 END) AS BIGINT) AS quarantined_rows
         |FROM flagged""".stripMargin,

    "b5_merge_upsert" ->
      """WITH target AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'),
        |source AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice * 1.1 AS l_extendedprice, l_returnflag
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'),
        |merged AS (
        |  SELECT t.* FROM target t
        |  WHERE NOT EXISTS (SELECT 1 FROM source s
        |                    WHERE s.l_orderkey = t.l_orderkey
        |                      AND s.l_linenumber = t.l_linenumber)
        |  UNION ALL SELECT * FROM source)
        |SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM merged GROUP BY l_returnflag""".stripMargin,

    "s1_dim_extract" ->
      """SELECT DISTINCT c_custkey, c_name, c_mktsegment, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "s2_date_dim" ->
      """SELECT CAST(datediff('day', DATE '2015-01-01', d) + 1 AS INTEGER) AS DateID,
        |       d AS Date,
        |       CAST(year(d) AS INTEGER) AS Year,
        |       CAST(month(d) AS INTEGER) AS Month,
        |       CAST(day(d) AS INTEGER) AS Day,
        |       monthname(d) AS MonthName,
        |       dayname(d) AS DayName
        |FROM (SELECT CAST(gs AS DATE) AS d
        |      FROM generate_series(DATE '2015-01-01', DATE '2016-12-31', INTERVAL 1 DAY) t(gs))""".stripMargin,

    "s3_pii_hash" ->
      """SELECT c_custkey,
        |       sha256(CAST(c_custkey AS VARCHAR) || 'graft_pii_salt_2024') AS patient_key,
        |       c_mktsegment
        |FROM customer""".stripMargin,

    "s4_fact_build" ->
      """SELECT o_orderkey AS claim_id,
        |       sha256(CAST(o_custkey AS VARCHAR) || 'graft_pii_salt_2024') AS patient_key,
        |       o_totalprice AS amount,
        |       o_orderdate AS claim_date,
        |       o_orderstatus AS status
        |FROM orders""".stripMargin,

    "s5_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_lines,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    // one-shot SCD2 chain: consecutive-change collapse per key under
    // the (ts, orderkey) total order, then [ts, next-ts) intervals —
    // the incremental two-batch build must land exactly here
    "s6_scd2_dim" ->
      """WITH ch AS (SELECT o_custkey AS k, o_orderstatus AS v,
        |                   o_orderdate AS ts, o_orderkey AS tie
        |            FROM orders WHERE o_custkey < 100),
        |o AS (SELECT *, lag(v) OVER (PARTITION BY k ORDER BY ts, tie) AS pv
        |      FROM ch),
        |kept AS (SELECT * FROM o WHERE pv IS NULL OR v <> pv),
        |ver AS (SELECT k, v, ts,
        |          lead(ts) OVER (PARTITION BY k ORDER BY ts, tie) AS eto
        |        FROM kept)
        |SELECT k AS o_custkey, v AS o_orderstatus, ts AS effective_from,
        |       eto AS effective_to, (eto IS NULL) AS is_current
        |FROM ver""".stripMargin,

    // s6's version chain, zero-length versions dropped (invisible to
    // any as-of query), then the point-in-interval lookup as a plain
    // range-predicate LEFT JOIN — the semantics Scd2.asOfJoin's
    // interleave must reproduce exactly
    "s6b_scd2_asof" ->
      """WITH ch AS (SELECT o_custkey AS k, o_orderstatus AS v,
        |                   o_orderdate AS ts, o_orderkey AS tie
        |            FROM orders WHERE o_custkey < 100),
        |o AS (SELECT *, lag(v) OVER (PARTITION BY k ORDER BY ts, tie) AS pv
        |      FROM ch),
        |kept AS (SELECT * FROM o WHERE pv IS NULL OR v <> pv),
        |ver AS (SELECT k, v, ts,
        |          lead(ts) OVER (PARTITION BY k ORDER BY ts, tie) AS eto
        |        FROM kept),
        |live AS (SELECT * FROM ver WHERE eto IS NULL OR ts < eto),
        |fact AS (SELECT o_orderkey, o_custkey AS k,
        |    CASE WHEN o_orderkey % 50 = 0 THEN CAST(o_orderdate AS DATE) - 20000
        |         ELSE CAST(o_orderdate AS DATE) + 30 END AS fact_date
        |  FROM orders WHERE o_custkey < 100)
        |SELECT f.o_orderkey, f.k AS o_custkey, f.fact_date,
        |       v.v AS asof_status, v.ts AS asof_from
        |FROM fact f LEFT JOIN live v
        |  ON f.k = v.k AND v.ts <= f.fact_date
        | AND (v.eto IS NULL OR f.fact_date < v.eto)""".stripMargin,

    "g1_distinct_domains" ->
      "SELECT DISTINCT o_orderstatus FROM orders",

    "g2_staging_projection" ->
      """SELECT DISTINCT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders""".stripMargin,

    "g3_conditional_upsert" ->
      """WITH staging AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
        |         c_mktsegment
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 50 = 0)
        |SELECT
        |  (SELECT count(*) FROM customer t JOIN staging s ON t.c_custkey = s.c_custkey
        |   WHERE t.c_name IS DISTINCT FROM s.c_name
        |      OR t.c_acctbal IS DISTINCT FROM s.c_acctbal
        |      OR t.c_mktsegment IS DISTINCT FROM s.c_mktsegment) AS rows_updated,
        |  (SELECT count(*) FROM staging s
        |   WHERE NOT EXISTS (SELECT 1 FROM customer t WHERE t.c_custkey = s.c_custkey)) AS rows_inserted,
        |  (SELECT count(*) FROM (SELECT c_custkey FROM customer
        |                         UNION SELECT c_custkey FROM staging) u) AS total_rows""".stripMargin,

    "g4_measure_pack" -> {
      val typeCols = PriorityTypes.map { case (label, value) =>
        s"CAST(sum(CASE WHEN o_orderpriority = '$value' THEN 1 ELSE 0 END) AS BIGINT) AS ${label}_claims"
      }.mkString(",\n        |       ")
      s"""SELECT count(*) AS total_claims,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(l_extendedprice) AS average_amount,
        |       count(DISTINCT o_custkey) AS unique_patients,
        |       count(DISTINCT l_suppkey) AS unique_providers,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS approved_claims,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS denied_claims,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_claims,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS approved_amount,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS denied_amount,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS pending_amount,
        |       $typeCols,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS approval_rate,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS denied_rate,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS pending_rate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin
    },

    "g13_salted_agg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,

    "g12_dim_avg" ->
      """SELECT count(*) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(c_acctbal) AS avg_acctbal
        |FROM customer""".stripMargin,

    "g5_measures_by_dim" ->
      """SELECT o_orderstatus AS status,
        |       CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       count(*) AS n_claims,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(o_totalprice) AS average_amount,
        |       count(DISTINCT o_custkey) AS unique_patients
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "g6_time_intelligence" ->
      """WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |         CAST(month(o_orderdate) AS INTEGER) AS mo,
        |         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS amount_mtd
        |  FROM orders GROUP BY 1, 2, 3),
        |cur AS (
        |  SELECT yr, qtr, mo, amount_mtd,
        |         sum(amount_mtd) OVER (PARTITION BY yr ORDER BY mo) AS amount_ytd,
        |         sum(amount_mtd) OVER (PARTITION BY yr, qtr ORDER BY mo) AS amount_qtd,
        |         sum(amount_mtd) OVER (ORDER BY yr*12 + mo
        |                               RANGE BETWEEN 11 PRECEDING AND CURRENT ROW) AS amount_r12m
        |  FROM monthly)
        |SELECT c.yr, c.mo,
        |       CAST(c.amount_mtd AS DOUBLE) AS amount_mtd,
        |       CAST(c.amount_qtd AS DOUBLE) AS amount_qtd,
        |       CAST(c.amount_ytd AS DOUBLE) AS amount_ytd,
        |       CAST(c.amount_r12m AS DOUBLE) AS amount_r12m,
        |       CAST(l.amount_mtd AS DOUBLE) AS amount_ly,
        |       CAST(c.amount_mtd - l.amount_mtd AS DOUBLE) AS amount_yoy_delta,
        |       CAST(c.amount_mtd - l.amount_mtd AS DOUBLE) / CAST(l.amount_mtd AS DOUBLE) AS amount_yoy_pct
        |FROM cur c LEFT JOIN monthly l ON l.yr = c.yr - 1 AND l.mo = c.mo""".stripMargin,

    "g6b_time_intel_count" ->
      """WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |         CAST(month(o_orderdate) AS INTEGER) AS mo,
        |         count(*) AS claims_mtd
        |  FROM orders GROUP BY 1, 2, 3),
        |cur AS (
        |  SELECT yr, qtr, mo, claims_mtd,
        |         sum(claims_mtd) OVER (PARTITION BY yr ORDER BY mo) AS claims_ytd,
        |         sum(claims_mtd) OVER (PARTITION BY yr, qtr ORDER BY mo) AS claims_qtd,
        |         sum(claims_mtd) OVER (ORDER BY yr*12 + mo
        |                               RANGE BETWEEN 11 PRECEDING AND CURRENT ROW) AS claims_r12m
        |  FROM monthly)
        |SELECT c.yr, c.mo,
        |       CAST(c.claims_mtd AS DOUBLE) AS claims_mtd,
        |       CAST(c.claims_qtd AS DOUBLE) AS claims_qtd,
        |       CAST(c.claims_ytd AS DOUBLE) AS claims_ytd,
        |       CAST(c.claims_r12m AS DOUBLE) AS claims_r12m,
        |       CAST(l.claims_mtd AS DOUBLE) AS claims_ly,
        |       CAST(c.claims_mtd - l.claims_mtd AS DOUBLE) AS claims_yoy_delta,
        |       CAST(c.claims_mtd - l.claims_mtd AS DOUBLE) / CAST(l.claims_mtd AS DOUBLE) AS claims_yoy_pct
        |FROM cur c LEFT JOIN monthly l ON l.yr = c.yr - 1 AND l.mo = c.mo""".stripMargin,

    "g7_topn" ->
      """SELECT o_custkey AS key,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |ORDER BY total DESC, key ASC LIMIT 10""".stripMargin,

    // g7b is the rewrite-rule form of g7: identical semantics by the
    // rule's value-identity contract, so the oracle is g7's
    "g7b_topn_naive" ->
      """SELECT o_custkey AS key,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |ORDER BY total DESC, key ASC LIMIT 10""".stripMargin,

    "g9_percentile" ->
      s"""SELECT o_orderstatus AS status,
        |       ${q4("CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE)")} AS p50,
        |       ${q4("CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE)")} AS p90,
        |       ${q4("CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE)")} AS p99
        |FROM orders GROUP BY 1""".stripMargin,

    "g10_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY 1""".stripMargin,

    // pivot then UNPIVOT back to long form; DuckDB's UNPIVOT drops
    // NULL cells, matching the entry's isNotNull filter
    "g10b_unpivot" ->
      """WITH w AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
        |    CAST(sum(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
        |    CAST(sum(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
        |  FROM orders GROUP BY 1)
        |UNPIVOT w ON F, O, P INTO NAME status VALUE total""".stripMargin,

    "g11_rollup" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(status, prio)""".stripMargin,

    "g11b_cube" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(status, prio)""".stripMargin,

    "g16_outliers" ->
      s"""WITH base AS (SELECT o_orderstatus AS grp, o_totalprice AS v FROM orders),
        |med AS (SELECT grp, CAST(quantile_cont(v, 0.5) AS DOUBLE) AS med
        |        FROM base GROUP BY 1),
        |dev AS (SELECT b.grp, ${q4("abs(CAST(b.v AS DOUBLE) - m.med)")} AS adev
        |        FROM base b JOIN med m USING (grp)),
        |mad AS (SELECT d.grp, min(m.med) AS med,
        |               CAST(quantile_cont(d.adev, 0.5) AS DOUBLE) AS mad
        |        FROM dev d JOIN med m USING (grp) GROUP BY 1),
        |thr AS (SELECT grp, med, mad,
        |               ${q4("CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad")} AS thr
        |        FROM mad)
        |SELECT d.grp, count(*) AS n,
        |       ${q4("min(t.med)")} AS med,
        |       ${q4("min(t.mad)")} AS mad,
        |       CAST(sum(CASE WHEN d.adev > t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN thr t USING (grp)
        |GROUP BY d.grp""".stripMargin,

    "g19_salted_join" ->
      """SELECT o_orderstatus AS status, count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "g20_profile" ->
      """SELECT 'l_orderkey' AS col_name, count(l_orderkey) AS n_nonnull,
        |       count(DISTINCT l_orderkey) AS n_distinct,
        |       CAST(min(l_orderkey) AS VARCHAR) AS min_value,
        |       CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(l_quantity), count(DISTINCT l_quantity),
        |       CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', count(l_returnflag), count(DISTINCT l_returnflag),
        |       CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
        |FROM lineitem""".stripMargin,

    "g21_incremental_rollup" ->
      s"""SELECT o_orderstatus AS status, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |       ${q6("CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)" +
          " / count(*)")} AS avg_price
        |FROM orders GROUP BY 1""".stripMargin,

    // g33: (entity, month) distinct → actives; first month per entity
    // (lexicographic min as yr*100+mo) → news; months-sized running sum
    "g33_new_vs_returning" ->
      """WITH em AS (SELECT DISTINCT o_custkey AS ent,
        |    CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    CAST(month(o_orderdate) AS INTEGER) AS mo FROM orders),
        |act AS (SELECT yr, mo, count(*) AS n_active FROM em GROUP BY 1, 2),
        |fst AS (SELECT ent, min(yr * 100 + mo) AS ym FROM em GROUP BY 1),
        |news AS (SELECT CAST(ym // 100 AS INTEGER) AS yr,
        |    CAST(ym % 100 AS INTEGER) AS mo, count(*) AS n_new
        |  FROM fst GROUP BY 1, 2)
        |SELECT a.yr, a.mo, a.n_active,
        |  CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
        |  a.n_active - CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_returning,
        |  CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY a.yr, a.mo
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_entities
        |FROM act a LEFT JOIN news n USING (yr, mo)""".stripMargin,

    "g24_dense_months" ->
      """WITH b AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |                  date_trunc('month', max(o_orderdate)) AS hi FROM orders),
        |m0 AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS gs FROM b),
        |m AS (SELECT CAST(year(gs) AS INTEGER) AS yr,
        |             CAST(month(gs) AS INTEGER) AS mo FROM m0),
        |grps AS (SELECT DISTINCT o_orderstatus AS grp FROM orders),
        |f AS (SELECT o_orderstatus AS grp,
        |             CAST(year(o_orderdate) AS INTEGER) AS yr,
        |             CAST(month(o_orderdate) AS INTEGER) AS mo,
        |             count(*) AS n,
        |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |      FROM orders GROUP BY 1, 2, 3)
        |SELECT grp, yr, mo, coalesce(f.n, 0) AS n,
        |       coalesce(f.total, 0.0) AS total
        |FROM grps CROSS JOIN m LEFT JOIN f USING (grp, yr, mo)""".stripMargin,

    "g25_share_of_total" ->
      s"""WITH cells AS (SELECT o_orderstatus AS grp, o_orderpriority AS sub,
        |                      count(*) AS n,
        |                      sum(CAST(o_totalprice AS DECIMAL(18,4))) AS dt
        |               FROM orders GROUP BY 1, 2),
        |g AS (SELECT grp, sum(dt) AS gt FROM cells GROUP BY 1),
        |a AS (SELECT sum(dt) AS at FROM cells)
        |SELECT grp, sub, n, CAST(dt AS DOUBLE) AS total,
        |       ${q6("CAST(dt AS DOUBLE) / CAST(gt AS DOUBLE)")} AS share_of_group,
        |       ${q6("CAST(dt AS DOUBLE) / CAST(at AS DOUBLE)")} AS share_of_grand
        |FROM cells JOIN g USING (grp) CROSS JOIN a""".stripMargin,

    "g26_moving_avg" ->
      s"""WITH m AS (SELECT o_orderstatus AS grp,
        |                  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |                  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |                  count(*) AS n,
        |                  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS dt
        |           FROM orders GROUP BY 1, 2, 3)
        |SELECT grp, yr, mo, n, CAST(dt AS DOUBLE) AS total,
        |       ${q6("CAST(sum(dt) OVER w3 AS DOUBLE) / count(*) OVER w3")} AS ma3,
        |       CAST(sum(dt) OVER wc AS DOUBLE) AS cum_total
        |FROM m
        |WINDOW w3 AS (PARTITION BY grp ORDER BY yr, mo
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |       wc AS (PARTITION BY grp ORDER BY yr, mo
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "g27_abc_class" ->
      s"""WITH m AS (SELECT o_orderstatus AS grp, o_custkey AS mem,
        |                  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS dt
        |           FROM orders GROUP BY 1, 2),
        |s AS (SELECT grp, dt,
        |        ${q6("CAST(sum(dt) OVER (PARTITION BY grp ORDER BY dt DESC, mem" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)" +
          " / CAST(sum(dt) OVER (PARTITION BY grp) AS DOUBLE)")} AS share
        |      FROM m),
        |c AS (SELECT grp, CASE WHEN share <= 0.8 THEN 'A'
        |                       WHEN share <= 0.95 THEN 'B'
        |                       ELSE 'C' END AS abc_class, dt FROM s)
        |SELECT grp, abc_class, count(*) AS n_members, CAST(sum(dt) AS DOUBLE) AS total
        |FROM c GROUP BY 1, 2""".stripMargin,

    // g37: the window carries exact decimal Σx/Σx²; mean/var/z are
    // IEEE from those exact sums in written order, z rounded before
    // the threshold compare — both engines bit-agree
    "g37_anomaly_days" ->
      s"""WITH daily AS (SELECT event_type AS grp, CAST(ts AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,4))) AS dt FROM events GROUP BY 1, 2),
        |w AS (SELECT grp, day, dt,
        |    count(dt) OVER win AS n_base,
        |    sum(dt) OVER win AS s1,
        |    sum(CAST(dt*dt AS DECIMAL(38,8))) OVER win AS s2
        |  FROM daily WINDOW win AS (PARTITION BY grp ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |f AS (SELECT grp, day, CAST(dt AS DOUBLE) AS total,
        |    CAST(s1 AS DOUBLE)/7 AS mean,
        |    (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/7)/6 AS vr
        |  FROM w WHERE n_base = 7),
        |g AS (SELECT grp, day, total, ${q6("mean")} AS baseline_mean,
        |    CASE WHEN vr > 0
        |         THEN ${q6("(total - mean)/sqrt(vr)")} END AS z
        |  FROM f)
        |SELECT grp, day, total, baseline_mean, z,
        |  coalesce(z > 3.0, false) AS is_anomaly
        |FROM g""".stripMargin,

    // g38: catalog measures are exact-decimal sums / exact counts with
    // one IEEE division per ratio, replayed in the same written order
    "g38_semantic_eval" ->
      """SELECT c_mktsegment,
        |       count(*) AS total_claims,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount,
        |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_claims,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F'
        |                     THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
        |         AS finished_amount,
        |       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE)
        |         / count(*) AS finished_rate,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |         / count(o_totalprice) AS average_amount
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE year(o_orderdate) >= 1995
        |GROUP BY 1""".stripMargin,

    // g38b: month grain through the Dates dimension is lossless (the
    // generated calendar spans the corpus), so the oracle reads the
    // calendar parts off the fact date directly; all running/LY sums
    // stay DECIMAL, one IEEE cast per output column, the division
    // replayed in the written order
    "g38b_time_intel_eval" ->
      """WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         CAST(month(o_orderdate) AS INTEGER) AS mo,
        |         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS amount_mtd
        |  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1, 2),
        |cur AS (
        |  SELECT yr, mo, amount_mtd,
        |         sum(amount_mtd) OVER (PARTITION BY yr ORDER BY mo) AS amount_ytd
        |  FROM monthly)
        |SELECT c.yr, c.mo,
        |       CAST(c.amount_ytd AS DOUBLE) AS amount_ytd,
        |       CAST(l.amount_mtd AS DOUBLE) AS amount_ly,
        |       CAST(c.amount_mtd - l.amount_mtd AS DOUBLE)
        |         / CAST(l.amount_mtd AS DOUBLE) AS amount_yoy_pct
        |FROM cur c LEFT JOIN monthly l ON l.yr = c.yr - 1 AND l.mo = c.mo""".stripMargin,

    // g38d: the per-cell series replayed with PARTITION BY cell and a
    // cell-matched LY join (null-strict, like the Spark side)
    "g38d_time_intel_matrix" ->
      """WITH monthly AS (
        |  SELECT c_mktsegment,
        |         CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         CAST(month(o_orderdate) AS INTEGER) AS mo,
        |         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS amount_mtd
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderstatus IN ('F', 'O') GROUP BY 1, 2, 3),
        |cur AS (
        |  SELECT c_mktsegment, yr, mo, amount_mtd,
        |         sum(amount_mtd) OVER (PARTITION BY c_mktsegment, yr
        |                               ORDER BY mo) AS amount_ytd
        |  FROM monthly)
        |SELECT c.c_mktsegment, c.yr, c.mo,
        |       CAST(c.amount_ytd AS DOUBLE) AS amount_ytd,
        |       CAST(c.amount_mtd - l.amount_mtd AS DOUBLE)
        |         / CAST(l.amount_mtd AS DOUBLE) AS amount_yoy_pct
        |FROM cur c LEFT JOIN monthly l
        |  ON l.c_mktsegment = c.c_mktsegment
        |  AND l.yr = c.yr - 1 AND l.mo = c.mo""".stripMargin,

    // g39: the model TOPN replay — dim-key grouping through the LEFT
    // join, measure-desc/key-asc deterministic cut
    "g39_topn_model" ->
      """WITH g AS (
        |  SELECT c_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |           AS total_amount,
        |         count(*) AS total_claims
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderstatus = 'F' GROUP BY 1)
        |SELECT c_custkey, total_amount, total_claims FROM g
        |ORDER BY total_amount DESC, c_custkey LIMIT 10""".stripMargin,

    // g40: exact-decimal (cell, year) totals, latest/previous-year
    // pivot with 0 coalesce, total delta as a window sum, one IEEE
    // division for the contribution share
    "g40_yoy_contribution" ->
      s"""WITH y AS (
        |  SELECT c_mktsegment AS cell,
        |         CAST(year(o_orderdate) AS INTEGER) AS ry,
        |         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS t
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |m AS (SELECT *, max(ry) OVER () AS max_yr FROM y),
        |two AS (SELECT cell, max(max_yr) AS yr,
        |          coalesce(sum(CASE WHEN ry = max_yr THEN t END),
        |                   CAST(0 AS DECIMAL(28,4))) AS cur_dec,
        |          coalesce(sum(CASE WHEN ry = max_yr - 1 THEN t END),
        |                   CAST(0 AS DECIMAL(28,4))) AS prev_dec
        |        FROM m WHERE ry >= max_yr - 1 GROUP BY 1),
        |d AS (SELECT *, cur_dec - prev_dec AS delta_dec,
        |        sum(cur_dec - prev_dec) OVER () AS total_dec FROM two)
        |SELECT cell, yr,
        |  CAST(cur_dec AS DOUBLE) AS amount_cur,
        |  CAST(prev_dec AS DOUBLE) AS amount_prev,
        |  CAST(delta_dec AS DOUBLE) AS delta,
        |  CASE WHEN total_dec = 0 THEN NULL
        |       ELSE ${q6("CAST(delta_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)")}
        |       END AS contrib_frac
        |FROM d""".stripMargin,

    // g38e: the collapsed-year drill rows — mtd at the year's last
    // observed month (rn=1 over mo DESC), ytd as the running total at
    // that month (= the year total), ly as the contiguity-guarded lag
    // of full-year totals per segment; decimal throughout, one IEEE
    // cast per output column
    "g38e_time_intel_drill" ->
      """WITH monthly AS (
        |  SELECT c_mktsegment,
        |         CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         CAST(month(o_orderdate) AS INTEGER) AS mo,
        |         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS amount_mtd
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderstatus IN ('F', 'O') GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT c_mktsegment, yr, mo, amount_mtd,
        |         sum(amount_mtd) OVER (PARTITION BY c_mktsegment, yr
        |                               ORDER BY mo) AS amount_ytd,
        |         sum(amount_mtd) OVER (PARTITION BY c_mktsegment, yr)
        |           AS yr_total,
        |         row_number() OVER (PARTITION BY c_mktsegment, yr
        |                            ORDER BY mo DESC) AS rn
        |  FROM monthly),
        |y AS (SELECT c_mktsegment, yr, amount_mtd, amount_ytd, yr_total
        |      FROM w WHERE rn = 1),
        |l AS (SELECT *,
        |        CASE WHEN lag(yr) OVER (PARTITION BY c_mktsegment
        |                                ORDER BY yr) = yr - 1
        |             THEN lag(yr_total) OVER (PARTITION BY c_mktsegment
        |                                      ORDER BY yr) END AS ly
        |      FROM y)
        |SELECT c_mktsegment, yr AS d_year,
        |       CAST(amount_mtd AS DOUBLE) AS amount_mtd,
        |       CAST(amount_ytd AS DOUBLE) AS amount_ytd,
        |       CAST(ly AS DOUBLE) AS amount_ly,
        |       CAST(yr_total - ly AS DOUBLE) / CAST(ly AS DOUBLE)
        |         AS amount_yoy_pct
        |FROM l""".stripMargin,

    // g38c: GROUPING SETS replay of the hierarchy rollup — DuckDB's
    // GROUPING bit order matches Spark's grouping_id (first level most
    // significant)
    "g38c_hierarchy_rollup" ->
      """WITH f AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS d_year,
        |                  CAST(month(o_orderdate) AS INTEGER) AS d_month,
        |                  CAST(day(o_orderdate) AS INTEGER) AS d_day,
        |                  o_totalprice
        |           FROM orders WHERE o_orderstatus = 'F')
        |SELECT d_year, d_month, d_day,
        |       CAST(GROUPING(d_year)*4 + GROUPING(d_month)*2
        |            + GROUPING(d_day) AS BIGINT) AS lvl,
        |       count(*) AS total_claims,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
        |FROM f GROUP BY ROLLUP(d_year, d_month, d_day)""".stripMargin,

    // g36: every arithmetic step replayed in Spark's written order
    // ((v-lo)/((hi-lo)/20.0) then floor/clamp) so bin edges agree
    // bit for bit
    "g36_histogram" ->
      s"""WITH b AS (SELECT min(CAST(o_totalprice AS DOUBLE)) AS lo,
        |                  max(CAST(o_totalprice AS DOUBLE)) AS hi FROM orders),
        |c AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
        |      WHERE o_totalprice IS NOT NULL),
        |x AS (SELECT CASE WHEN hi = lo THEN 0
        |        ELSE least(CAST(floor((v - lo)/((hi - lo)/20.0)) AS BIGINT), 19)
        |        END AS bin, lo, hi FROM c, b)
        |SELECT bin,
        |  ${q6("min(lo) + bin*((min(hi) - min(lo))/20.0)")} AS bin_lo,
        |  ${q6("min(lo) + (bin+1)*((min(hi) - min(lo))/20.0)")} AS bin_hi,
        |  count(*) AS n
        |FROM x GROUP BY bin""".stripMargin,

    // g35: exact-decimal rank formula — the only double op is the
    // final division, so both engines agree bit for bit at 6 dp
    "g35_gini" ->
      s"""WITH m AS (SELECT o_orderstatus AS grp, o_custkey AS mem,
        |                  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS v
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT grp, v, CAST(row_number() OVER (PARTITION BY grp
        |        ORDER BY v, mem) AS BIGINT) AS i FROM m),
        |a AS (SELECT grp, count(*) AS n_members, sum(v) AS s0,
        |             sum(i * v) AS s1 FROM r GROUP BY 1)
        |SELECT grp, n_members, CAST(s0 AS DOUBLE) AS total,
        |  CASE WHEN s0 = 0 THEN NULL
        |       ELSE ${q6("CAST(2*s1 - (n_members+1)*s0 AS DOUBLE)" +
          " / CAST(n_members*s0 AS DOUBLE)")} END AS gini
        |FROM a""".stripMargin,

    "g28_fk_audit" ->
      """SELECT 'orders->customer' AS relationship,
        |  (SELECT count(*) FROM orders) AS n_child,
        |  (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_null_keys,
        |  (SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o.o_custkey)) AS n_orphans,
        |  (SELECT count(*) FROM customer) AS n_parents,
        |  (SELECT count(*) FROM customer c
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                     WHERE o.o_custkey = c.c_custkey)) AS n_childless_parents
        |UNION ALL
        |SELECT 'lineitem->orders',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
        |  (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders o
        |                     WHERE o.o_orderkey = l.l_orderkey)),
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                     WHERE l.l_orderkey = o.o_orderkey))""".stripMargin,

    "g30_skew_report" ->
      s"""WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_rows
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM c),
        |r AS (SELECT key, n_rows,
        |        ${q6("CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE)")} AS share,
        |        row_number() OVER (ORDER BY n_rows DESC, key) AS rnk
        |      FROM c CROSS JOIN t)
        |SELECT key, n_rows, share, CAST(rnk AS INTEGER) AS rnk
        |FROM r WHERE rnk <= 10""".stripMargin,

    "g22_winsorize" ->
      s"""WITH base AS (SELECT o_orderstatus AS grp, o_totalprice AS v FROM orders
        |              WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT grp,
        |             ${q4("CAST(quantile_cont(v, 0.05) AS DOUBLE)")} AS lo,
        |             ${q4("CAST(quantile_cont(v, 0.95) AS DOUBLE)")} AS hi
        |      FROM base GROUP BY 1)
        |SELECT grp, count(*) AS n,
        |       CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |       CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |       CAST(sum(CAST(least(greatest(v, lo), hi) AS DECIMAL(18,4))) AS DOUBLE) AS wtotal,
        |       min(lo) AS lo, min(hi) AS hi
        |FROM base JOIN b USING (grp)
        |GROUP BY grp""".stripMargin,

    "g23_event_transitions" ->
      s"""WITH seqd AS (SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |pairs AS (SELECT from_type, to_type, count(*) AS n
        |          FROM seqd WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       ${q6("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)")}
        |         AS p
        |FROM pairs""".stripMargin,

    // g31: per-user ordered type list (ts, event_id tiebreak — the
    // same total order as g23), truncated at 8 steps, counted, top-10
    // with path-string tiebreak
    "g31_event_paths" ->
      """WITH p AS (SELECT user_id,
        |    array_to_string((list(event_type ORDER BY ts, event_id))[1:8],
        |                    '>') AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 10""".stripMargin,

    // sequential min-timestamp chain, one CTE per funnel step
    "g17_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM events e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type,
        |       (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin,

    // g17's chain with the per-step 24h deadline as an extra residual
    // predicate on each join
    "g32_window_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s1.t
        |         AND e.ts <= s1.t + INTERVAL 86400 SECOND GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM events e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t
        |         AND e.ts <= s2.t + INTERVAL 86400 SECOND GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type,
        |       (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin,

    // the same earliest-qualifying-event chain as g17, keeping each
    // converting user's step timestamps; per-step seconds-from-previous
    // mirror funnelLatency's float-op order (epoch-micros diff as
    // DOUBLE / 1000000.0, mean over DECIMAL(28,6), R-7 percentiles)
    "g17b_funnel_latency" ->
      s"""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM events e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1),
        |l2 AS (SELECT CAST(epoch_us(s2.t) - epoch_us(s1.t) AS DOUBLE)
        |              / 1000000.0 AS secs
        |       FROM s2 JOIN s1 USING (user_id)),
        |l3 AS (SELECT CAST(epoch_us(s3.t) - epoch_us(s2.t) AS DOUBLE)
        |              / 1000000.0 AS secs
        |       FROM s3 JOIN s2 USING (user_id))
        |SELECT 2 AS step, 'click' AS event_type,
        |       CAST(count(*) AS BIGINT) AS n_users,
        |       ${q4("CAST(sum(CAST(secs AS DECIMAL(28,6))) AS DOUBLE)" +
          " / count(*)")} AS mean_secs,
        |       ${q4("quantile_cont(secs, 0.5)")} AS p50_secs,
        |       ${q4("quantile_cont(secs, 0.9)")} AS p90_secs
        |FROM l2
        |UNION ALL
        |SELECT 3, 'purchase', CAST(count(*) AS BIGINT),
        |       ${q4("CAST(sum(CAST(secs AS DECIMAL(28,6))) AS DOUBLE)" +
          " / count(*)")},
        |       ${q4("quantile_cont(secs, 0.5)")},
        |       ${q4("quantile_cont(secs, 0.9)")}
        |FROM l3""".stripMargin,

    "g18_retention" ->
      """WITH a AS (SELECT user_id, date_trunc('week', ts) AS aw FROM events),
        |c AS (SELECT user_id, min(aw) AS cohort_week FROM a GROUP BY 1),
        |d AS (SELECT DISTINCT user_id, aw FROM a)
        |SELECT cohort_week,
        |       CAST(floor(date_diff('day', cohort_week, aw) / 7) AS INTEGER)
        |         AS week_offset,
        |       count(*) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "g8_ingestion_log" ->
      s"""WITH ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
         |            ORDER BY l_shipdate DESC, l_linenumber DESC, l_partkey DESC,
         |                     l_suppkey DESC, l_quantity DESC, l_extendedprice DESC,
         |                     l_discount DESC, l_tax DESC, l_returnflag DESC,
         |                     l_linestatus DESC) AS rn
         |  FROM lineitem),
         |buckets AS (
         |  SELECT CASE WHEN rn > 1 THEN 'duplicate'
         |              WHEN ($DqReasonSql) <> '' THEN 'bad_quality'
         |              ELSE 'clean' END AS bucket
         |  FROM ranked),
         |counts AS (SELECT bucket, count(*) AS n FROM buckets GROUP BY bucket)
         |SELECT a.bucket, CAST(coalesce(c.n, 0) AS BIGINT) AS n
         |FROM (VALUES ('duplicate'), ('bad_quality'), ('clean'),
         |             ('malformed')) AS a(bucket)
         |LEFT JOIN counts c ON c.bucket = a.bucket""".stripMargin)
}
