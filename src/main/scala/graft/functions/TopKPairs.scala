package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k largest (sim, id) pairs under the
  * ordering (sim desc, id asc). Backed by a min-heap whose root is the
  * current weakest element, so each update is O(log k) and the buffer
  * never exceeds k entries.
  */
final class TopKBuffer(val k: Int) {
  // weakest-first ordering: smaller sim first; on ties, LARGER id first
  // (so the kept element is the smaller id, matching "id asc" ranking)
  private[functions] val heap = mutable.PriorityQueue.empty[(Double, Long)](
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) })

  def insert(sim: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((sim, id))
    else {
      val (ws, wi) = heap.head
      if (sim > ws || (sim == ws && id < wi)) { heap.dequeue(); heap.enqueue((sim, id)) }
    }

  /** Strongest-first: sim desc, id asc. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, i) => (-s, i) }
}

/** Aggregate top-k of (sim, id) pairs per group — the scale-correct
  * form of `row_number().over(partitionBy(g).orderBy(sim desc, id))
  * <= k`: the window form shuffles and sorts EVERY scored row per
  * group, while this partial-aggregates, so each map partition sends
  * at most k candidates per group to the shuffle. For a kNN query set
  * of Q queries over N corpus vectors that is Q×k rows shuffled
  * instead of Q×N.
  *
  * Input: struct<sim double, id long> (non-null fields). Output:
  * array<struct<sim double, id long>> strongest-first with ties broken
  * by id asc — deterministic for unique ids regardless of partition
  * order.
  */
case class TopKPairs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_pairs"

  private val entryType = StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(StructField(_, DoubleType, _, _),
                          StructField(_, LongType, _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<double, bigint>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(entryType, containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.insert(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buf.insert(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i): Any
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val entries = buf.heap.toArray
    val bb = ByteBuffer.allocate(8 + entries.length * 16)
    bb.putInt(buf.k).putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s).putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(child = newChildren.head)
}
