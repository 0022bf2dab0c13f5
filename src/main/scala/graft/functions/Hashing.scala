package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-independent hash primitives for the dedup/fingerprint family.
  *
  * Everything is built on md5 hex (identical in any engine) rather than
  * Spark-native murmur/xxhash (whose exact values an external oracle
  * can't reproduce). All expressions are `functions._` compositions —
  * no UDFs — so they stay inside codegen.
  */
object Hashing {
  /** 2^31 - 1, the Mersenne prime used for 32-bit modular hashing:
    * products a*h with a < 2^31 stay under 2^62 — no 64-bit overflow. */
  val P32: Long = 2147483647L

  val RollP: Long = 1000000007L

  /** First 60 bits of md5(s) as a non-negative long. */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** md5-based 32-bit hash into [0, P32). */
  def h32(c: Column): Column = md5Long60(c) % P32

  /** Low / high 32 md5 bits (for 64-bit fingerprints without sign
    * overflow: keep halves separate). */
  def md5Lo32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)
  def md5Hi32(c: Column): Column = conv(substring(md5(c), 9, 8), 16, 10).cast(LongType)

  /** Universal-hash family h_i(x) = (a*x + b) mod P32 over h32 values. */
  def affine(h: Column, a: Long, b: Long): Column = (lit(a) * h + lit(b)) % P32

  /** Polynomial rolling hash over an array of strings:
    * fold h = (h*31 + h32(tok)) mod RollP, init 7. */
  def rollingHash(tokens: Column): Column =
    aggregate(tokens, lit(7L), (acc, t) => (acc * 31 + h32(t)) % RollP)
}
