package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static, Java-callable kernels for the text expressions below. The
  * expressions' doGenCode emits a single call into these, so the work
  * stays inside whole-stage codegen without generating string-handling
  * Java inline.
  */
object TextKernels {

  private val ws = Pattern.compile("\\s+")

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Distinct word n-gram shingles of the lowercased text, first-
    * occurrence order. Must match exactly:
    * array_distinct(transform(seq, i => concat_ws(" ", slice(tokens, i, n))))
    * with tokens = filter(split(lower(text), "\\s+"), _ != "").
    * Lowercasing goes through UTF8String.toLowerCase — the same code
    * path as Spark's lower() — so values are bit-identical. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = ws.split(text.toLowerCase.toString).filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** h32 of one string: first 60 bits of md5 (= the first 15 hex chars
    * as an unsigned value) mod P32 — bit-identical to
    * conv(substring(md5(s), 1, 15), 16, 10) % P32. */
  def h32(s: UTF8String): Long = {
    val d = md5.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    // 64 bits read, keep the top 60 (15 hex chars)
    (v >>> 4) % Hashing.P32
  }

  /** h32 applied to every element (elements must be non-null). */
  def h32Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = h32(arr.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingles of the lowercased text (see
  * [[TextKernels.shingles]]). Replaces an interpreted HOF stack
  * (split + filter + transform(slice + concat_ws) + array_distinct)
  * with one codegen-friendly kernel call. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Element-wise md5-based h32 over an array<string> (see
  * [[TextKernels.h32]]): one digest per string, no hex encode/parse
  * round-trip, no interpreted transform(). */
case class H32Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_h32_array"

  override def nullSafeEval(input: Any): Any =
    TextKernels.h32Array(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.h32Array($c)")

  override protected def withNewChildInternal(newChild: Expression): H32Array =
    copy(child = newChild)
}
