package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd random-hyperplane LSH sign-bucket over an `array<double>`
  * vector: a bit string like "0110.." with one char per plane, '1' iff
  * the integer-weighted projection is >= 0.
  *
  * Plane weights are the deterministic pseudo-random family
  * `w(p, d) = (31p + 17d) mod 7 - 3` (small integers, so projections
  * stay exact and an external engine reproduces them bit-for-bit).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * formulation in [[graft.ann.Knn.lshBucket]]: HOFs evaluate
  * interpreted (a closure call per element per plane) and block
  * whole-stage codegen; this compiles to a primitive double loop.
  * Summation order per plane is the same strict left-to-right fold, so
  * buckets are bit-identical to the HOF form (spec-checked).
  */
case class LshSignBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes > 0, "planes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val buf = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < n) {
        s += x.getDouble(d) * ((31L * p + 17L * d) % 7L - 3L).toDouble
        d += 1
      }
      buf(p) = if (s >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(buf)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |final byte[] $buf = new byte[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += $a.getDouble($d) * (double)((31L * $p + 17L * $d) % 7L - 3L);
         |  }
         |  $buf[$p] = ($s >= 0) ? (byte) '1' : (byte) '0';
         |}
         |${ev.value} = UTF8String.fromBytes($buf);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignBucket =
    copy(child = newChild)
}
