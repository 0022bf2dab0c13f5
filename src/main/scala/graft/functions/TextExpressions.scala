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

  /** Polynomial rolling hash over a string array — fold
    * h = (h*31 + h32(tok)) mod RollP from init 7, bit-identical to
    * aggregate(tokens, 7L, (acc, t) => (acc*31 + h32(t)) % RollP). */
  def rollingHash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var h = 7L
    var i = 0
    while (i < n) {
      h = (h * 31 + h32(tokens.getUTF8String(i))) % Hashing.RollP
      i += 1
    }
    h
  }

  /** 64-bit SimHash of a token array as 16 hex chars, one md5 per
    * token. Bit-identical to the per-bit HOF formulation in
    * [[graft.dedup.TextDedup.simHashHex]]: the two 32-bit halves come
    * from md5 hex chars 1–8 ("lo", printed second) and 9–16 ("hi",
    * printed first); bit j of a half is set iff the signed token vote
    * sum for that bit is > 0 (ties → 0). */
  def simHash64(tokens: ArrayData): UTF8String = {
    val votes = new Array[Int](64) // 0..31 = lo half, 32..63 = hi half
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val d = md5.get().digest(tokens.getUTF8String(i).getBytes)
      var lo = 0L; var hi = 0L
      var b = 0
      while (b < 4) {
        lo = (lo << 8) | (d(b) & 0xffL)
        hi = (hi << 8) | (d(b + 4) & 0xffL)
        b += 1
      }
      var j = 0
      while (j < 32) {
        votes(j) += (if (((lo >>> j) & 1L) == 1L) 1 else -1)
        votes(32 + j) += (if (((hi >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var loFp = 0L; var hiFp = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) loFp |= (1L << j)
      if (votes(32 + j) > 0) hiFp |= (1L << j)
      j += 1
    }
    UTF8String.fromString(f"$hiFp%08x$loFp%08x")
  }

  /** Unicode NFC (canonical composition). Quick-checks first so clean
    * ASCII/NFC strings pass through without allocation. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
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

/** 64-bit SimHash hex fingerprint of a token array (see
  * [[TextKernels.simHash64]]). Replaces 64 per-bit interpreted
  * aggregate passes with one pass over the tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simHash64(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Polynomial rolling hash of a token array (see
  * [[TextKernels.rollingHash]]); order-sensitive content fingerprint. */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingHash(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** Unicode NFC normalization (canonical composition) — the missing
  * Spark built-in the charset-repair path needs (DuckDB ships it as
  * nfc_normalize; both engines implement the same Unicode standard
  * form, so results are cross-engine exact). The kernel short-circuits
  * on already-normalized strings (the overwhelmingly common case for
  * clean corpora) via Normalizer.isNormalized's quick-check pass. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    TextKernels.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
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
