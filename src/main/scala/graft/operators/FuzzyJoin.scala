package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance join — record linkage / entity resolution
  * ("is this incoming provider name a typo of one we know?"), the fuzzy
  * counterpart of the exact keyed MERGE the reference's upsert loop
  * runs (sp_upsert_claims.sql matches on equality; a real feed also
  * carries near-miss keys).
  *
  * Candidate generation is PassJoin-style segment blocking (Li, Deng,
  * Feng, ICDE 2011 — public literature): a right-side string of length
  * L splits into k+1 contiguous segments; if lev(a,b) <= k then by
  * pigeonhole at least one of b's segments occurs EXACTLY in a, at a
  * start position shifted by at most k — so b indexes its k+1 segments
  * under (L, segment#, content), a probes every substring it could
  * match ((2k+1) candidate lengths × (k+1) segments × (2k+1) starts, a
  * compile-time constant fan-out), and the equi-join on
  * (L, segment#, content) is provably lossless. Survivors are verified
  * with the real `levenshtein` (threshold form, so the DP early-exits
  * past k) over DISTINCT candidate pairs.
  *
  * Scale shape: two map-only constant-factor explodes, one hash
  * shuffle on the block key, no nested-loop stage anywhere. Blocking
  * is content-based, so its selectivity is the data's: a corpus of
  * near-identical strings (shared constant prefixes, tiny vocabulary)
  * degenerates toward the quadratic answer it actually has — hot
  * blocks then ride AQE skew-join splitting, or pre-salt with
  * [[Skew.saltedJoin]]. Strings shorter than k+1 produce empty
  * segments that match everything of a compatible length (still
  * lossless, just unselective) — filter trivial strings upstream.
  */
object FuzzyJoin {

  /** Segment i's 1-based (start, length) when a string of length `n`
    * splits into k+1 parts: the first (k+1-rem) segments get
    * floor(n/(k+1)) chars, the rest one more (rem = n mod (k+1)). */
  private def segBounds(n: Column, i: Column, k: Int): (Column, Column) = {
    val parts = k + 1
    val base = floor(n / lit(parts)).cast("int")
    val thresh = lit(parts) - (n % parts).cast("int")
    val len = base + when(i >= thresh, 1).otherwise(0)
    val start = lit(1) + i * base + greatest(lit(0), i - thresh)
    (start, len)
  }

  /** Every (left_id, right_id, dist) pair with
    * levenshtein(leftStr, rightStr) <= k. `k` must be 1..3 — beyond
    * that the (2k+1)²(k+1) probe fan-out and the O(len·k) verify stop
    * being the right tool (use n-gram Jaccard, d2's family). */
  def byEditDistance(left: DataFrame, leftId: Column, leftStr: Column,
                     right: DataFrame, rightId: Column, rightStr: Column,
                     k: Int): DataFrame = {
    require(k >= 1 && k <= 3, s"k must be in 1..3, got $k")

    // index: right splits into k+1 segments keyed (L, seg#, content)
    val rBase = right.select(rightId.as("__rid"), rightStr.as("__rstr"))
    val rLen = length(col("__rstr"))
    val idx = {
      val (st, ln) = segBounds(rLen, col("__i"), k)
      rBase
        .select(col("__rid"), col("__rstr"),
          explode(sequence(lit(0), lit(k))).as("__i"))
        .select(col("__rid"), col("__rstr"), col("__i"),
          rLen.as("__bl"), col("__rstr").substr(st, ln).as("__s"))
    }

    // probe: for every candidate right-length L = len(a)+delta and
    // segment i, every substring of a with segment i's length starting
    // within ±k of segment i's home position. The (delta, i, shift)
    // triple is DECODED from one exploded flat index rather than
    // unrolled into a (2k+1)²(k+1)-element literal array: the unrolled
    // form's generated doConsume blows janino's 64 KB method limit at
    // k >= 2 and drops the whole stage out of codegen — the decoded
    // form is a loop over ints plus one substr, and stays compiled.
    val lBase = left.select(leftId.as("__lid"), leftStr.as("__lstr"))
    val aLen = length(col("__lstr"))
    val span = 2 * k + 1
    val probe = {
      val t = col("__t")
      val delta = (t / (span * (k + 1))).cast("int") - k
      val segI = ((t % (span * (k + 1))) / span).cast("int")
      val shift = (t % span).cast("int") - k
      val bl = aLen + delta
      val (st, ln) = segBounds(bl, segI, k)
      val start = st + shift
      lBase
        .select(col("__lid"), col("__lstr"),
          explode(sequence(lit(0), lit(span * span * (k + 1) - 1))).as("__t"))
        .select(col("__lid"), col("__lstr"), segI.as("__i"), bl.as("__bl"),
          start.as("__p0"), ln.as("__pl"),
          col("__lstr").substr(start, ln).as("__s"))
        // a real occurrence fits inside a: start >= 1, end <= len(a);
        // candidate length 0 stays — an empty right string is within k
        // edits of any left string of length <= k (all its segments are
        // "" and match at start 1); negative lengths can't be a string
        .filter(col("__bl") >= 0 && col("__p0") >= 1 &&
          col("__p0") + col("__pl") - 1 <= length(col("__lstr")))
        .select(col("__lid"), col("__lstr"), col("__i"), col("__bl"), col("__s"))
    }

    probe.join(idx, Seq("__i", "__bl", "__s"))
      .select(col("__lid"), col("__lstr"), col("__rid"), col("__rstr"))
      .distinct()
      .withColumn("dist", levenshtein(col("__lstr"), col("__rstr"), k))
      .filter(col("dist") >= 0) // threshold form returns -1 past k
      .select(col("__lid").as("left_id"), col("__rid").as("right_id"),
        col("dist"))
  }
}
