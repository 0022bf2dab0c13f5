package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.dedup.TextDedup
import graft.functions._

/** SQL registration of graft's custom Catalyst expressions, so SQL
  * users get the same codegen'd kernels the DataFrame API uses:
  *
  *   SELECT graft_dot(a.e, b.e)              -- dense dot product
  *   SELECT graft_word_shingles(text, 3)     -- distinct word n-grams
  *   SELECT graft_h32_array(shingles)        -- md5-based h32 per element
  *   SELECT graft_minhash_sig(hashes)        -- K-wide MinHash signature
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *  - [[GraftFunctions.register]] on a live session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    // latest-per-key window → min_by aggregation (see the rule's doc)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopOneRewrite)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def oneArg(name: String, f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(e) => f(e)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.length}")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double>"),
      {
        case Seq(a, b) => DotProduct(a, b)
        case args => throw new IllegalArgumentException(
          s"graft_dot expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles",
        "graft_word_shingles(text, n) - distinct lowercased word n-grams"),
      {
        case Seq(t, Literal(n: Int, IntegerType)) => WordShingles(t, n)
        case Seq(t) => WordShingles(t, 3)
        case args => throw new IllegalArgumentException(
          "graft_word_shingles expects (text[, n literal])")
      }),
    (FunctionIdentifier("graft_h32_array"),
      info("graft_h32_array",
        "graft_h32_array(arr) - md5-based 32-bit hash of each string"),
      oneArg("graft_h32_array", H32Array)),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(hashes) - K-wide MinHash signature over h32 values"),
      oneArg("graft_minhash_sig",
        MinHashMins(_, TextDedup.MinHashA, TextDedup.MinHashB, Hashing.P32))),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(tokens) - 64-bit SimHash of a token array, as 16 hex chars"),
      oneArg("graft_simhash64", SimHash64)),
    (FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash",
        "graft_rolling_hash(tokens) - order-sensitive 64-bit rolling hash"),
      oneArg("graft_rolling_hash", RollingHash64)),
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(text) - Unicode NFC canonical composition"),
      oneArg("graft_nfc", NfcNormalize)),
    (FunctionIdentifier("graft_lsh_bucket"),
      info("graft_lsh_bucket",
        "graft_lsh_bucket(vec, planes) - sign-quadrant LSH bucket of an array<double>"),
      {
        case Seq(v, Literal(p: Int, IntegerType)) => LshSignBucket(v, p)
        case _ => throw new IllegalArgumentException(
          "graft_lsh_bucket expects (vec, planes literal)")
      }),
    (FunctionIdentifier("graft_byte_window_sums"),
      info("graft_byte_window_sums",
        "graft_byte_window_sums(bytes, dim) - per-residue unsigned byte sums mod dim"),
      {
        case Seq(b, Literal(d: Int, IntegerType)) => ByteWindowSums(b, d)
        case _ => throw new IllegalArgumentException(
          "graft_byte_window_sums expects (bytes, dim literal)")
      }),
    (FunctionIdentifier("graft_byte_window_means"),
      info("graft_byte_window_means",
        "graft_byte_window_means(bytes, dim) - contiguous-window unsigned byte means"),
      {
        case Seq(b, Literal(d: Int, IntegerType)) => ByteWindowMeans(b, d)
        case _ => throw new IllegalArgumentException(
          "graft_byte_window_means expects (bytes, dim literal)")
      }),
    (FunctionIdentifier("graft_bit_spread"),
      info("graft_bit_spread",
        "graft_bit_spread(x, stride, bits) - Morton spread: bit i of x moves to bit i*stride"),
      {
        case Seq(x, Literal(s: Int, IntegerType), Literal(b: Int, IntegerType)) =>
          BitSpread(x, s, b)
        case _ => throw new IllegalArgumentException(
          "graft_bit_spread expects (x, stride literal, bits literal)")
      }),
    (FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count",
        "graft_sorted_intersect_count(a, b) - |A∩B| of two SORTED array<bigint> sets"),
      {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case args => throw new IllegalArgumentException(
          s"graft_sorted_intersect_count expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("graft_freq_items"),
      info("graft_freq_items",
        "graft_freq_items(item, k) - Misra-Gries heavy-hitters summary of capacity k"),
      {
        case Seq(e, Literal(k: Int, IntegerType)) =>
          MisraGries(e, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_freq_items expects (item, k literal)")
      }))

  /** Register all graft SQL functions on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
