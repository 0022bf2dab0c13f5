package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys.
  *
  * AQE's skew-join split handles sort-merge cases adaptively; these
  * explicit forms cover what AQE can't: broadcast-ineligible skewed
  * joins planned up front, and aggregations whose per-partition hash
  * maps blow up on hot keys.
  *
  * Both are deterministic — the salt is a hash of stable columns, not
  * rand() — so results are reproducible run to run (the oracle gate
  * and restarted stages both depend on that).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Inner join where `big`'s keys are skewed and `small` is too large
    * to broadcast whole but can be replicated `factor`×: each big row
    * gets a deterministic salt in [0, factor) hashed from `saltFrom`
    * (pick columns that spread the hot key's rows, e.g. a line number
    * or event id); `small` is exploded across all salt values. The
    * shuffle key becomes (keys, salt), splitting each hot key's rows
    * across `factor` reducers instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: Seq[Column], factor: Int): DataFrame = {
    require(factor > 0)
    val saltedBig = big.withColumn(SaltCol, pmod(hash(saltFrom: _*), lit(factor)))
    val saltedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(saltedSmall, keys :+ SaltCol).drop(SaltCol)
  }

  /** Two-phase sum/count aggregation: partial groupBy (keys, salt) then
    * final groupBy (keys). Spark's hash aggregate already map-side
    * combines, but when one key dominates a partition's data the FINAL
    * shuffle still lands that key on one reducer with all its partial
    * rows; pre-splitting by salt bounds any reducer's share to
    * 1/factor of a hot key. Aggregations must be algebraic (sum/count
    * here — extend with min/max as needed).
    *
    * Measured honestly (SCALING.md r8): for plain SUM/COUNT this buys
    * ~nothing even on a 60%-hot key — map-side combine already
    * collapses the hot key to one partial row per mapper, so the
    * final shuffle ships O(mappers) rows regardless of skew. The
    * salted form's domain is aggregation state the partial CAN'T
    * pre-collapse under a hot key: high-cardinality DISTINCT,
    * collect_list/set, sketch merges with large per-key state. For
    * the JOIN leg the salted win is real and grows with size —
    * see [[saltedJoin]] and SCALING.md's curve. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], amount: Column,
                     saltFrom: Seq[Column], factor: Int): DataFrame = {
    require(factor > 0)
    df.withColumn(SaltCol, pmod(hash(saltFrom: _*), lit(factor)))
      .groupBy((keys.map(col) :+ col(SaltCol)): _*)
      .agg(sum(amount).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))
  }

  /** The PLANNING input for the tools above: the top-k hottest keys of
    * a prospective shuffle column with each key's exact row count and
    * share of the table. Whether a join needs [[saltedJoin]] (and with
    * what factor — a key holding share `s` of the data needs roughly
    * `s × shuffle.partitions` reducers' worth of splitting) is decided
    * from exactly this report; it is also the heavy-hitter audit a
    * skew incident starts from.
    *
    * Shape: ONE map-side-combined keyed count (the same single shuffle
    * the prospective join would pay), the total re-aggregated from the
    * counts frame into a one-row broadcast, top-k via bounded
    * per-partition heaps (TakeOrderedAndProject — t10's posture, never
    * a global sort). Output (key, n_rows, share, rnk), ties on key
    * asc; share rounds to 6 dp. */
  def keyShareReport(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n_rows"))
    // total as an unpartitioned window sum over the |keys| frame (the
    // one-row-attach form re-executed the corpus groupBy per branch —
    // pruning defeats exchange reuse); exact long sum, same values
    counts
      .withColumn("share",
        // §6 quantizer (graft.functions.Quantize): engine-identical
        // at the half boundary, unlike round(double, n)
        graft.functions.Quantize.qdp(col("n_rows").cast("double") /
          sum(col("n_rows")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()).cast("double"), 6))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(k)
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_rows").desc, col("key"))).cast("int"))
  }
}
