package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns using higher-order
  * functions (zip_with/aggregate) — map-only, no UDFs, no shuffles.
  *
  * The fold in [[dot]] is a strict left-to-right sequential sum, which
  * an external engine can reproduce exactly; outputs compared across
  * engines are additionally rounded (see SparkEntry) to absorb any
  * vectorized-summation reordering on the oracle side.
  */
object Vectors {
  /** Element-wise cast to double (exact for float inputs). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
