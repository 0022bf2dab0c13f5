package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, floor, lit}

/** The §6 presentation quantizer: `floor(x·10^dp + 0.5) / 10^dp` —
  * half-up via PURE IEEE ops, so two engines evaluating it on an
  * identical double get an identical result at ANY magnitude.
  *
  * This exists because `round(double, n)` is engine-DEPENDENT at the
  * boundary: Spark rounds the double's shortest-decimal repr (via
  * `BigDecimal.valueOf`), DuckDB rounds the binary value — a quotient
  * or sum landing within an ulp of a half boundary (measured ~1 in
  * 4500 rows at sf0.1, r11) rounds differently. A double→decimal cast
  * has the same split once the ulp nears the decimal resolution
  * (measured on x21 at r13). The floor form sidesteps both: multiply,
  * add, floor, divide are each a single IEEE op with one defined
  * result.
  *
  * Contract notes:
  *  - Half-UP (toward +∞), not half-away-from-zero: −2.5e−6 at dp 6
  *    quantizes to −2e−6. Fine for cross-engine parity (the oracle
  *    replays the same ops); callers that need away-from-zero on
  *    negatives don't — no shipped measure does.
  *  - Spark's `floor(double)` returns BIGINT (cast back to double
  *    before the divide); exact while |x·10^dp| < 2^53, far above any
  *    shipped measure's range.
  *  - The DuckDB twin must write its constants as
  *    `CAST(1000000 AS DOUBLE)` / `CAST(0.5 AS DOUBLE)` (a bare
  *    DuckDB numeric literal is DECIMAL and would change the op). */
object Quantize {

  def qdp(c: Column, dp: Int): Column = {
    require(dp >= 0 && dp <= 12, s"dp must be in [0, 12], got $dp")
    val m = math.pow(10, dp) // exact for dp <= 15
    floor(c * lit(m) + lit(0.5)).cast("double") / lit(m)
  }

  /** The identical DuckDB expression, for oracle generators. */
  def qdpSql(expr: String, dp: Int): String = {
    require(dp >= 0 && dp <= 12, s"dp must be in [0, 12], got $dp")
    val m = "1" + ("0" * dp)
    s"floor(($expr) * CAST($m AS DOUBLE) + CAST(0.5 AS DOUBLE)) / " +
      s"CAST($m AS DOUBLE)"
  }

  /** Convenience overload for a named column. */
  def qdp(name: String, dp: Int): Column = qdp(col(name), dp)
}
