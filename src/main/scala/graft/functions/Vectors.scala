package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Dense-vector math over `array<double>` columns — map-only, no UDFs,
  * no shuffles. The dot product is the codegen'd [[DotProduct]]
  * expression (primitive loop inside whole-stage codegen).
  *
  * [[dot]] is a strict left-to-right sequential sum, which an external
  * engine can reproduce exactly; outputs compared across engines are
  * additionally rounded (see SparkEntry) to absorb any vectorized-
  * summation reordering on the oracle side.
  */
object Vectors {
  /** Element-wise cast to double (exact for float inputs). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** THE similarity contract every ANN operator scores with: cosine
    * over precomputed norms, §6-quantized to 6 dp ([[Quantize]]
    * scaladoc — floor half-up in pure IEEE ops, engine-identical at
    * the half boundary where round(double, 6) is not). `nProd` is the
    * precomputed norm product (na · nb). */
  def qcos(a: Column, b: Column, nProd: Column): Column =
    Quantize.qdp(dot(a, b) / nProd, 6)
}
