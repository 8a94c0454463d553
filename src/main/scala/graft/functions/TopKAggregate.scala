package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded-heap state of [[BoundedTopK]]: a max-heap of the k smallest
 * struct rows seen so far (head = current kth), so memory is O(k) per
 * group regardless of group size — the aggregate replacement for the
 * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` pattern, whose
 * window sorts EVERY candidate row of a group in one task.
 */
final class TopKBuffer(val ord: Ordering[InternalRow], val k: Int) {
  val heap = new java.util.PriorityQueue[InternalRow](k, ord.reverse)
  def add(r: InternalRow): Unit =
    if (heap.size < k) heap.offer(r)
    else if (ord.lt(r, heap.peek())) { heap.poll(); heap.offer(r) }
  /** Admission probe over a REUSED row: compare first, copy only if the
    * row would enter the heap — the hot path sees every candidate row
    * but admits at most k per group, so skipping the per-row copy for
    * rejected candidates removes the dominant allocation. */
  def addMaybe(r: UnsafeRow): Unit =
    if (heap.size < k) heap.offer(r.copy())
    else if (ord.lt(r, heap.peek())) { heap.poll(); heap.offer(r.copy()) }
  def sortedAsc: Array[InternalRow] = {
    val a = new Array[InternalRow](heap.size)
    heap.toArray(a)
    java.util.Arrays.sort(a, ord)
    a
  }
}

/**
 * `BoundedTopK(structExpr, k)` — the k SMALLEST struct values per
 * group under the struct's natural lexicographic ordering, returned as
 * an ascending array. Rank columns derive as `posexplode` position +1;
 * the kth value is the array's last element.
 *
 * Scale rationale (SURVEY §2.5): a rank window shuffles EVERY candidate
 * row to its group's task and sorts there — for a kNN join that is all
 * candidate pairs. As a TypedImperativeAggregate this runs inside
 * ObjectHashAggregate WITH map-side partial aggregation: each mapper
 * ships at most k rows per group, and no per-group sort of the full
 * candidate set ever happens. Determinism: callers put a tie-breaking
 * unique key in the struct (e.g. (dist, trainId)), making the result a
 * total-order prefix — independent of combine order.
 */
case class BoundedTopK(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bounded_top_k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if RowOrdering.isOrderable(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bounded_top_k expects an orderable struct, got $other")
    }

  @transient private lazy val ordering: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(structType.map(_.dataType))
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)
  // Fast update path: when the struct is a literal CreateNamedStruct
  // (every caller in this codebase), project its FIELD expressions
  // straight off the input row in ONE codegen'd UnsafeProjection —
  // skipping the interpreted per-row struct eval + re-projection. The
  // projection's output row is reused; TopKBuffer.addMaybe copies only
  // on heap admission.
  @transient private lazy val directProj: UnsafeProjection = child match {
    case s: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct
        if s.valExprs.forall(_.deterministic) =>
      UnsafeProjection.create(s.valExprs)
    case _ => null
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(ordering, k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    if (directProj != null) {
      b.addMaybe(directProj(input))
    } else {
      val v = child.eval(input)
      // copy through an UnsafeProjection: the evaluated struct row is a
      // reused mutable row, and unsafe bytes also make serialize cheap
      if (v != null) b.add(toUnsafe(v.asInstanceOf[InternalRow]).copy())
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = b.sortedAsc
    new GenericArrayData(rows.map(_.asInstanceOf[Any]))
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val rows = b.sortedAsc.map(_.asInstanceOf[UnsafeRow])
    val total = 4 + rows.map(r => 4 + r.getSizeInBytes).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(rows.length)
    rows.foreach { r =>
      buf.putInt(r.getSizeInBytes)
      r.writeTo(buf)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val b = createAggregationBuffer()
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val nFields = structType.size
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val copy = new Array[Byte](len)
      buf.get(copy) // own the bytes: the wrapped array is transient
      val row = new UnsafeRow(nFields)
      row.pointTo(copy, len)
      b.heap.offer(row) // already <= k rows, no displacement possible
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}
