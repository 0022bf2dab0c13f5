package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All K MinHash signature values in one pass over a pre-hashed shingle
  * array: out(k) = min over h in hs of (a(k)*h + b(k)) mod p.
  *
  * Replaces K separate `array_min(transform(hs, affine))` columns —
  * that form costs K interpreted passes (each allocating an
  * intermediate array) and inflates the Catalyst tree by K hash
  * subtrees, which dominates first-run analysis + Janino time. This is
  * one compact codegen'd loop; same arithmetic, same output
  * (`array<long>` of length K).
  *
  * Preconditions (guaranteed by [[graft.dedup.TextDedup]]): hs elements
  * are non-null h32 values in [0, p); a(k) < p so a*h < 2^62 — no
  * overflow. Empty input yields an array of p (affine never reaches p,
  * matching array_min of an empty transform = null is avoided upstream
  * by the size(sh) > 0 filter).
  */
case class MinHashMins(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_mins"

  private val k = as.length

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(k)(p)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |final int $n = $c.numElements();
         |final long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${p}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMins =
    copy(child = newChild)
}
