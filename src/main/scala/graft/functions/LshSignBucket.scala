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
  * Plane weights are the md5-derived family
  * [[LshSignBucket.weight]] `w(p, d) = h32("p:d") % 7 - 3` — small
  * integers in [-3, 3], so projections stay exact and an external
  * engine reproduces them bit-for-bit, but (unlike a linear
  * congruential family) with no algebraic relation between planes:
  * every (plane, dim) cell is an independent md5 draw, so the planes
  * are genuinely distinct hyperplanes and the standard sign-LSH
  * collision model P(bit agrees) = 1 - angle/pi applies. (The previous
  * family `(31p + 17d) % 7 - 3` was periodic in p with period 7 —
  * 31 = 17 = 3 (mod 7) makes the weight a function of (p+d) mod 7
  * alone — so a 24-plane signature had at most 7 distinct bits.)
  *
  * Null vector elements are skipped (they contribute 0 to the
  * projection), matching what `list_sum(list_transform(...))` does in
  * the DuckDB oracle, identically in interpreted and codegen paths.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * formulation in [[graft.ann.Knn.lshBucket]]: HOFs evaluate
  * interpreted (a closure call per element per plane) and block
  * whole-stage codegen; this compiles to a primitive double loop over
  * a precomputed constant weight table. Summation order per plane is
  * the same strict left-to-right fold, so buckets are bit-identical
  * to the HOF form (spec-checked).
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

  /** planes x MaxDims weight table, row-major; built once per
    * materialized instance (planning-time copies never touch it). */
  @transient private lazy val weights: Array[Byte] =
    LshSignBucket.weightTable(planes)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > LshSignBucket.MaxDims) {
      throw new IllegalArgumentException(
        s"$prettyName supports at most ${LshSignBucket.MaxDims} dims, got $n")
    }
    val w = weights
    val buf = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      val off = p * LshSignBucket.MaxDims
      var s = 0.0
      var d = 0
      while (d < n) {
        if (!x.isNullAt(d)) s += x.getDouble(d) * w(off + d)
        d += 1
      }
      buf(p) = if (s >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(buf)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lshWeights", weights, "byte[]")
    val maxDims = LshSignBucket.MaxDims
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      s"""
         |final int $n = $a.numElements();
         |if ($n > $maxDims) {
         |  throw new IllegalArgumentException(
         |    "graft_lsh_bucket supports at most $maxDims dims, got " + $n);
         |}
         |final byte[] $buf = new byte[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  final int $off = $p * $maxDims;
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$a.isNullAt($d)) {
         |      $s += $a.getDouble($d) * (double) $wRef[$off + $d];
         |    }
         |  }
         |  $buf[$p] = ($s >= 0) ? (byte) '1' : (byte) '0';
         |}
         |${ev.value} = UTF8String.fromBytes($buf);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignBucket =
    copy(child = newChild)
}

object LshSignBucket {

  /** Upper bound on vector dimensionality (the weight table is
    * precomputed to this width; inputs longer than this throw). */
  val MaxDims: Int = 512

  /** The deterministic per-(plane, dim) hyperplane weight:
    * `h32("p:d") % 7 - 3`, an integer in [-3, 3], where h32 is the
    * repo-wide md5-based 32-bit hash ([[Hashing.h32]] in column form).
    * md5 makes every cell an independent draw — no periodicity across
    * planes — while staying exactly reproducible in any engine with
    * md5 (the DuckDB oracle bakes the same values as list literals,
    * like the MinHash coefficient constants). */
  def weight(p: Int, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % Hashing.P32) % 7 - 3).toInt
  }

  private[functions] def weightTable(planes: Int): Array[Byte] = {
    val t = new Array[Byte](planes * MaxDims)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < MaxDims) {
        t(p * MaxDims + d) = weight(p, d).toByte
        d += 1
      }
      p += 1
    }
    t
  }
}
