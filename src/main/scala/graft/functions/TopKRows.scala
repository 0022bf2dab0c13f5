package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer of the k first-ranked rows under an external
  * comparator. Each entry is one standalone UnsafeRow packing
  * (ordering struct, carried row struct); the heap root is the
  * currently WORST-ranked entry, so an update is O(log k) and the
  * buffer never holds more than k rows — the partial-aggregation
  * property the whole rewrite exists for.
  */
final class TopKRowsBuffer(val k: Int, worstFirst: Ordering[UnsafeRow]) {
  private[functions] val heap =
    mutable.PriorityQueue.empty[UnsafeRow](worstFirst)

  /** `pair` may be a reused projection buffer: it is copied only when
    * it actually enters the heap. Ties with the boundary keep the
    * incumbent — the same arbitrary-winner contract as row_number. */
  def insert(pair: UnsafeRow): Unit =
    if (heap.size < k) { heap.enqueue(pair.copy()): Unit }
    else if (worstFirst.compare(pair, heap.head) < 0) {
      heap.dequeue(); heap.enqueue(pair.copy()): Unit
    }

  /** Rank order (best first). */
  def sorted: Array[UnsafeRow] = heap.toArray.sorted(worstFirst)
}

/** Aggregate top-k FULL ROWS per group under an arbitrary window
  * ordering — the engine behind [[graft.plans.WindowTopOneRewrite]]'s
  * `rn <= k` path, generalizing [[TopKPairs]] (which is the typed
  * fast path for (double, long) pairs) to any row shape and any
  * per-key sort direction / null ordering.
  *
  * Input: `ord` = struct of the window's ORDER BY key values, `row` =
  * struct of the full input row. `directions(i)`/`nullsFirst(i)` carry
  * the i-th key's sort direction and null placement, compared via
  * Catalyst's [[InterpretedOrdering]] — exactly the engine a sort
  * would use, so the kept set equals the window form's first k ranks.
  * Output: array of the row structs, rank order (element i = rank
  * i+1). Ties at the k boundary keep an arbitrary admissible winner,
  * exactly like row_number under a non-total ordering.
  *
  * Scale contract: partial-aggregates (TypedImperativeAggregate →
  * ObjectHashAggregate), so each map partition ships at most k rows
  * per group and NOTHING sorts — the window form shuffles every row
  * and sorts each group. The trade is interpreted per-row evaluation
  * (ordering eval + one UnsafeProjection) against the deleted
  * shuffle+sort; see the rewrite's scaladoc for when each side wins.
  */
case class TopKRows(
    ord: Expression,
    row: Expression,
    k: Int,
    directions: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(ord, row)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_rows"

  override def checkInputDataTypes(): TypeCheckResult = (ord.dataType, row.dataType) match {
    case (o: StructType, _: StructType)
        if o.length == directions.length && o.length == nullsFirst.length =>
      TypeCheckResult.TypeCheckSuccess
    case (o, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (struct ord matching directions, struct row), " +
        s"got (${o.sql}, ${r.sql})")
  }

  private def ordType: StructType = ord.dataType.asInstanceOf[StructType]
  private def rowType: StructType = row.dataType.asInstanceOf[StructType]

  override def dataType: DataType =
    ArrayType(rowType, containsNull = false)

  /** Rank comparator over the packed (ord, row) pair: evaluates the
    * stored ordering struct exactly as a SortExec would. */
  @transient private lazy val rankOnPair: Ordering[UnsafeRow] = {
    val n = ordType.length
    val byOrd = new InterpretedOrdering(ordType.fields.zipWithIndex.map {
      case (f, i) => SortOrder(
        BoundReference(i, f.dataType, f.nullable),
        if (directions(i)) Ascending else Descending,
        if (nullsFirst(i)) NullsFirst else NullsLast,
        Seq.empty)
    }.toIndexedSeq)
    new Ordering[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int =
        byOrd.compare(a.getStruct(0, n), b.getStruct(0, n))
    }
  }

  @transient private lazy val pack: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](ordType, rowType))

  // reusable eval scratch: the GenericInternalRow wraps the array by
  // reference, so writing packInput(i) updates the row in place
  @transient private lazy val packInput = new Array[Any](2)
  @transient private lazy val packHolder =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(packInput)

  override def createAggregationBuffer(): TopKRowsBuffer =
    // PriorityQueue max = ordering max = worst rank under rankOnPair
    new TopKRowsBuffer(k, rankOnPair)

  override def update(buf: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    // CreateStruct values are never null as a whole; evaluate both and
    // pack into one UnsafeRow so heap entries own their memory
    packInput(0) = ord.eval(input)
    packInput(1) = row.eval(input)
    buf.insert(pack(packHolder))
    buf
  }

  override def merge(buf: TopKRowsBuffer, other: TopKRowsBuffer): TopKRowsBuffer = {
    other.heap.foreach(buf.insert)
    buf
  }

  override def eval(buf: TopKRowsBuffer): Any = {
    val n = rowType.length
    new GenericArrayData(buf.sorted.map(_.getStruct(1, n).copy(): Any))
  }

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = {
    val rows = buf.heap.toArray
    val total = 8 + rows.map(r => 4 + r.getSizeInBytes).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.k).putInt(rows.length)
    rows.foreach { r =>
      val bytes = r.getBytes
      bb.putInt(bytes.length).put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKRowsBuffer(bb.getInt(), rankOnPair)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      val r = new UnsafeRow(2)
      r.pointTo(arr, len)
      buf.heap.enqueue(r)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(ord = newChildren(0), row = newChildren(1))
}
