package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column data profiling — the "what is in this table" pass every
  * lake onboarding runs before trusting a feed (the reference's bronze
  * DQ gate at NBclaims_bronze.py:141-171 hand-writes range/domain
  * checks; a profile is how those thresholds get chosen in the first
  * place).
  */
object Profiler {

  /** Long-form profile: one output row per profiled column with its
    * non-null count, exact distinct count, and min/max rendered as
    * strings (computed on the native type FIRST, so numeric columns
    * order numerically, then cast for the uniform schema).
    *
    * Plan shape: ONE aggregation job. The multi-column distinct agg
    * plans a single Expand (input rows × profiled columns) feeding a
    * partially-aggregated distinct — each mapper combines before the
    * shuffle, so the wire carries per-partition distinct values, not
    * raw rows. That is the exact-answer posture for a bounded column
    * list; for very wide profiles at 100 TB the drop-in sketch swap is
    * `approx_count_distinct` (g14's HLL posture), which removes the
    * Expand entirely. No collect: the single result row explodes to
    * long form inside the plan. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_nonnull"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Equi-width numeric histogram — the distribution-SHAPE companion
    * to [[profile]]'s min/max (a profile says the range; a histogram
    * says where the mass sits — the modality/tail view that picks
    * binning thresholds, spots sentinel spikes, and feeds dashboard
    * sparklines; `TextAnalysis.quantileBins` is the equi-DEPTH dual).
    * Bounds come from ONE (min, max) partial aggregation broadcast
    * back (the constant-side one-row class); each value then maps to
    * `floor((v−min)/width)` clamped to the last bin — pure IEEE ops
    * in written order, engine-identical — and one keyed count per bin
    * finishes. Empty bins are absent (a dashboard densifies against
    * `sequence(0, nBins−1)` if it wants zeros). Per bin: index,
    * 6-dp-rounded [lo, hi) bounds, count.
    *
    * Scale: one map-only classification pass + one partial-aggregated
    * count shuffle over nBins keys — scan speed at 100 TB; no sort,
    * no per-row window. Degenerate min==max corpus lands wholly in
    * bin 0 (width 0 guard). */
  def histogram(df: DataFrame, value: Column, nBins: Int): DataFrame = {
    require(nBins >= 1, "histogram needs at least one bin")
    val bounds = df.agg(
      min(value.cast("double")).as("__lo"),
      max(value.cast("double")).as("__hi"))
    val width = (col("__hi") - col("__lo")) / lit(nBins.toDouble)
    df.select(value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col("__v") - col("__lo")) / width),
            lit(nBins - 1L))).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        // §6 quantizer on the width-quotient edges (Quantize scaladoc)
        graft.functions.Quantize.qdp(
          first(col("__lo")) + col("bin") * first(width), 6).as("bin_lo"),
        graft.functions.Quantize.qdp(
          first(col("__lo")) + (col("bin") + 1) * first(width), 6)
          .as("bin_hi"))
      .select("bin", "bin_lo", "bin_hi", "n")
  }

  /** Referential-integrity audit of one child→parent relationship —
    * the star-schema health check that decides whether s5's joins can
    * be inner (the reference's model relies on Claims→Patients/
    * Providers FKs holding; this measures whether they do): one row of
    * counts — child rows, null FKs, orphans (non-null FK with no
    * parent), parents, childless parents.
    *
    * Plan shape: two partial-aggregating counts + two left_anti hash
    * joins on the key, each aggregated to ONE row before the one-row
    * cross joins stitch the report row together (the documented
    * constant-side product class). Nothing fact-sized crosses the wire
    * unaggregated. */
  def fkAudit(child: DataFrame, childKey: Column,
              parent: DataFrame, parentKey: Column,
              relationship: String): DataFrame = {
    val c = child.select(childKey.as("__k"))
    val p = parent.select(parentKey.as("__p"))
    val cAgg = c.agg(count(lit(1)).as("n_child"),
      sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
    val orphans = c.filter(col("__k").isNotNull)
      .join(p, col("__k") === col("__p"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val pAgg = p.agg(count(lit(1)).as("n_parents"))
    val childless = p
      .join(c.filter(col("__k").isNotNull), col("__p") === col("__k"), "left_anti")
      .agg(count(lit(1)).as("n_childless_parents"))
    cAgg.crossJoin(orphans).crossJoin(pAgg).crossJoin(childless)
      .select(lit(relationship).as("relationship"), col("n_child"),
        col("n_null_keys"), col("n_orphans"), col("n_parents"),
        col("n_childless_parents"))
  }
}
