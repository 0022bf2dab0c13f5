package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd bit spread — the per-dimension half of a Morton (Z-order)
  * interleave: bit `i` of the input's low `bits` bits lands at output
  * position `i * stride`. Interleaving N dimensions is then
  * `spread(x_0) | spread(x_1) << 1 | ... | spread(x_{N-1}) << (N-1)`
  * with `stride = N` — see [[graft.operators.Layout.zValue]], which
  * composes this with the built-in shift/or so the whole z-value stays
  * inside whole-stage codegen.
  *
  * Bits above `bits` are ignored (callers quantize; the masking is the
  * loop bound, identical interpreted and compiled). Input long,
  * output long; `bits * stride <= 63` keeps the result non-negative.
  */
case class BitSpread(child: Expression, stride: Int, bits: Int)
    extends UnaryExpression {

  require(stride >= 1 && bits >= 1 && bits * stride <= 63,
    s"need stride >= 1, bits >= 1, bits*stride <= 63; got stride=$stride bits=$bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got ${dt.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bit_spread"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) { z |= ((x >>> i) & 1L) << (i * stride); i += 1 }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >>> $i) & 1L) << ($i * $stride);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BitSpread =
    copy(child = newChild)
}
