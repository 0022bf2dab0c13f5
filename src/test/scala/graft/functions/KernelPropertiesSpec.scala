package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the pure kernels against straightforward
  * reference implementations (no Spark session — plain JVM). */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def arr(ss: Seq[String]): GenericArrayData =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s): Any).toArray)

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))

  test("TopKBuffer equals sort-by-(sim desc, id asc) take k") {
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(-1.0, 1.0)), Gen.chooseNum(1, 8)) { (sims, k) =>
      val pairs = sims.zipWithIndex.map { case (s, i) => (s, i.toLong) }
      val buf = new TopKBuffer(k)
      pairs.foreach { case (s, i) => buf.insert(s, i) }
      val expect = pairs.sortBy { case (s, i) => (-s, i) }.take(k)
      buf.sorted.toSeq == expect
    })
  }

  test("TopKBuffer merge equals single-buffer over the concatenation") {
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(-1.0, 1.0)),
      Gen.listOf(Gen.chooseNum(-1.0, 1.0)), Gen.chooseNum(1, 6)) { (a, b, k) =>
      val all = (a ++ b).zipWithIndex.map { case (s, i) => (s, i.toLong) }
      val (pa, pb) = all.splitAt(a.length)
      val b1 = new TopKBuffer(k); pa.foreach { case (s, i) => b1.insert(s, i) }
      val b2 = new TopKBuffer(k); pb.foreach { case (s, i) => b2.insert(s, i) }
      b2.heap.foreach { case (s, i) => b1.insert(s, i) }
      val ref = new TopKBuffer(k); all.foreach { case (s, i) => ref.insert(s, i) }
      b1.sorted.toSeq == ref.sorted.toSeq
    })
  }

  test("shingles kernel equals sliding-window reference") {
    check(Prop.forAll(Gen.listOf(word), Gen.chooseNum(2, 4)) { (words, n) =>
      val text = words.mkString(" ")
      val got = TextKernels.shingles(UTF8String.fromString(text), n)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val expect =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      got == expect
    })
  }

  test("h32/rollingHash kernels equal the md5-hex reference path") {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    check(Prop.forAll(Gen.nonEmptyListOf(word)) { words =>
      val h32Ref = words.map(w =>
        java.lang.Long.parseLong(md5hex(w).substring(0, 15), 16) % Hashing.P32)
      val h32Got = (0 until words.length).map(i =>
        TextKernels.h32(UTF8String.fromString(words(i))))
      val rollRef = h32Ref.foldLeft(7L)((acc, h) => (acc * 31 + h) % Hashing.RollP)
      h32Got == h32Ref && TextKernels.rollingHash(arr(words)) == rollRef
    })
  }

  test("simHash64 equals the hex-substring bit-vote reference") {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    check(Prop.forAll(Gen.listOf(word)) { words =>
      def half(take: String => Long): Long = {
        val votes = Array.fill(32)(0)
        words.foreach { w =>
          val h = take(md5hex(w))
          (0 until 32).foreach(j =>
            votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1))
        }
        (0 until 32).foldLeft(0L)((acc, j) =>
          if (votes(j) > 0) acc | (1L << j) else acc)
      }
      val lo = half(h => java.lang.Long.parseLong(h.substring(0, 8), 16))
      val hi = half(h => java.lang.Long.parseLong(h.substring(8, 16), 16))
      val expect = f"$hi%08x$lo%08x"
      TextKernels.simHash64(arr(words)).toString == expect
    })
  }

  test("BitSpread: 2-dim Morton interleave round-trips and orders by quadrant") {
    def unspread(z: Long, stride: Int, bits: Int): Long = {
      var x = 0L
      for (i <- 0 until bits) x |= ((z >>> (i * stride)) & 1L) << i
      x
    }
    check(Prop.forAll(
      Gen.chooseNum(0L, (1L << 16) - 1), Gen.chooseNum(0L, (1L << 16) - 1)) {
      (x, y) =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        val zx = BitSpread(Literal(x), 2, 16).eval(null).asInstanceOf[Long]
        val zy = BitSpread(Literal(y), 2, 16).eval(null).asInstanceOf[Long]
        val z = zx | (zy << 1)
        // bijective: both coordinates recover exactly
        unspread(z, 2, 16) == x && unspread(z >>> 1, 2, 16) == y &&
          // top two z bits are exactly the two coordinates' top bits —
          // the quadrant-contiguity property file skipping relies on
          (z >>> 30) == (((y >>> 15) << 1) | (x >>> 15))
    })
  }
}
