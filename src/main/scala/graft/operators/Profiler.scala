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
