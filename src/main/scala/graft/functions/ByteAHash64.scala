package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit average-hash (aHash) perceptual fingerprint of a binary
  * payload — the classic image near-dup hash (public domain technique;
  * ubiquitous in pHash/imagehash literature): downsample to 64 cells,
  * bit w = cell w brighter than the whole. Here the "cells" are the
  * same contiguous byte windows [[ByteWindowMeans]] uses (window w
  * covers [w·n/64, (w+1)·n/64)), so this is exactly aHash over the
  * stub resize — swap the real image scaler into the resize step and
  * this becomes real aHash.
  *
  * Brightness comparison is INTEGER-exact: bit w is set iff
  * `sum_w · n > total · width_w` (strict; ties and empty windows give
  * 0) — no floating-point means anywhere, so any engine reproduces the
  * fingerprint bit-for-bit. Output: 16 lowercase hex chars, windows
  * 0..31 in the first half, MSB-first — the same banding/popcount
  * contract as the SimHash fingerprints. Safe for payloads up to
  * ~190 MB (255·n² stays inside a signed 64-bit long).
  */
case class ByteAHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${dt.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_byte_ahash64"

  override def nullSafeEval(v: Any): Any =
    ByteAHash64.hash(v.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteAHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteAHash64 =
    copy(child = newChild)
}

object ByteAHash64 {

  /** Static Java-callable kernel (see [[TextKernels]] for the pattern):
    * one pass for the 64 window sums, one integer-compare pass for the
    * bits. */
  def hash(bytes: Array[Byte]): UTF8String = {
    val n = bytes.length.toLong
    val sums = new Array[Long](64)
    var total = 0L
    var w = 0
    while (w < 64) {
      val st = (w * n / 64).toInt
      val en = ((w + 1) * n / 64).toInt
      var s = 0L
      var p = st
      while (p < en) { s += (bytes(p) & 0xff); p += 1 }
      sums(w) = s
      total += s
      w += 1
    }
    var h1 = 0L
    var h2 = 0L
    w = 0
    while (w < 64) {
      val width = ((w + 1) * n / 64) - (w * n / 64)
      val bit = if (sums(w) * n > total * width) 1L else 0L
      if (w < 32) h1 = (h1 << 1) | bit else h2 = (h2 << 1) | bit
      w += 1
    }
    UTF8String.fromString(f"$h1%08x$h2%08x")
  }
}
