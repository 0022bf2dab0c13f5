package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Codegen'd fixed-size feature vector over a binary payload:
  * `out(i) = sum of unsigned bytes at positions p ≡ i (mod dim)` —
  * the deterministic stand-in feature extraction of the multimodal
  * decode stub ([[graft.multimodal.Multimodal]]), as a native
  * expression so the decode column stays inside Catalyst/whole-stage
  * codegen instead of an RDD round-trip.
  */
case class ByteWindowSums(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0, "dim must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_byte_window_sums"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val sums = new Array[Double](dim)
    var p = 0
    while (p < bytes.length) {
      sums(p % dim) += (bytes(p) & 0xff).toDouble
      p += 1
    }
    new GenericArrayData(sums)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val sums = ctx.freshName("sums")
      val p = ctx.freshName("p")
      s"""
         |final double[] $sums = new double[$dim];
         |for (int $p = 0; $p < $b.length; $p++) {
         |  $sums[$p % $dim] += (double) ($b[$p] & 0xff);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sums);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteWindowSums =
    copy(child = newChild)
}
