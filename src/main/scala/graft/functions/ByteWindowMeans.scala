package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Codegen'd fixed-size downsample of a binary payload: the input is
  * split into `dim` contiguous windows (window w covers byte positions
  * [w·n/dim, (w+1)·n/dim) in integer arithmetic) and `out(w)` is the
  * mean unsigned byte of its window (0.0 for the empty windows a
  * short payload leaves) — the deterministic stand-in for the RESIZE
  * step of a media pipeline ([[graft.multimodal.Multimodal]]: a real
  * implementation swaps in the image scaler; the window/mean dataflow
  * and the fixed-size output contract are the Spark-side shape).
  */
case class ByteWindowMeans(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0, "dim must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_byte_window_means"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val out = new Array[Double](dim)
    val n = bytes.length.toLong
    var w = 0
    while (w < dim) {
      val start = (w * n / dim).toInt
      val end = ((w + 1) * n / dim).toInt
      var s = 0.0
      var p = start
      while (p < end) { s += (bytes(p) & 0xff).toDouble; p += 1 }
      out(w) = if (end > start) s / (end - start) else 0.0
      w += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val st = ctx.freshName("st")
      val en = ctx.freshName("en")
      val n = ctx.freshName("nbytes")
      s"""
         |final double[] $out = new double[$dim];
         |final long $n = (long) $b.length;
         |for (int $w = 0; $w < $dim; $w++) {
         |  final int $st = (int) ($w * $n / $dim);
         |  final int $en = (int) (($w + 1) * $n / $dim);
         |  double $s = 0.0;
         |  for (int $p = $st; $p < $en; $p++) { $s += (double) ($b[$p] & 0xff); }
         |  $out[$w] = $en > $st ? $s / ($en - $st) : 0.0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteWindowMeans =
    copy(child = newChild)
}
