package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency summary of capacity k: at most k (item,
  * weight) counters; a miss on a full summary decrements every counter
  * (dropping zeros) instead of inserting. The classic deterministic
  * heavy-hitters sketch (Misra & Gries 1982) in its MERGEABLE form
  * (Agarwal et al. 2012, "Mergeable summaries"): merging sums counters
  * and, when over capacity, subtracts the (k+1)-th largest weight from
  * all — the combined summary keeps the same error bound, which is
  * what makes it a valid distributed partial aggregate.
  *
  * Guarantees over a stream of N items, REGARDLESS of partitioning or
  * merge order: every estimate undercounts, `0 <= true - est <=
  * N/(k+1)`, and any item with true count > N/(k+1) is present.
  */
final class FreqBuffer(val k: Int) {
  private[functions] val counts = mutable.HashMap.empty[String, Long]

  def insert(item: String, w: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + w)
      case None if counts.size < k => counts.update(item, w)
      case None => decrementAll(w)
    }
  }

  /** The miss path: subtract `w` everywhere, but if `w` exceeds the
    * smallest counter the leftover re-inserts recursively — handled
    * iteratively by capping at the smallest counter per round. */
  private def decrementAll(w: Long): Unit = {
    var left = w
    while (left > 0) {
      if (counts.isEmpty) return
      val step = math.min(left, counts.values.min)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (t, c) =>
        if (c - step <= 0) dead += t else counts.update(t, c - step)
      }
      dead.foreach(counts.remove)
      left -= step
      if (counts.size < k) return // room again: drop the remainder
    }
  }

  def mergeIn(other: FreqBuffer): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest weight, drop non-positives
      val cut = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = counts.collect { case (t, c) if c - cut <= 0 => t }
      counts.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(counts.remove)
    }
  }

  /** (item, est) strongest-first, ties by item asc. */
  def sorted: Array[(String, Long)] =
    counts.toArray.sortBy { case (t, c) => (-c, t) }
}

/** Aggregate form: `graft_freq_items(item, k)` → array<struct<item
  * string, est bigint>> — the bounded-state heavy-hitters leg of the
  * vocabulary family (t10 is the exact top-k): each map partition
  * holds at most k counters and ships at most k rows, where the exact
  * form shuffles the full vocabulary. Not cross-engine reproducible
  * (summary content depends on merge order), so queries carry their
  * own evidence: the deterministic MG bound joined against exact
  * counts (see t10b).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"

  private val entryType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(entryType, containsNull = false)

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: FreqBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    })

  override def serialize(buf: FreqBuffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val bytes = entries.map { case (t, _) => t.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(
      8 + entries.length * 12 + bytes.map(_.length).sum)
    bb.putInt(buf.k).putInt(entries.length)
    entries.zip(bytes).foreach { case ((_, c), tb) =>
      bb.putInt(tb.length).put(tb).putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](bb.getInt()); bb.get(tb)
      buf.counts.update(new String(tb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
