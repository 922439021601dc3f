package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Buffer: a bounded max-heap of the k smallest (ordering, value) pairs
  * seen so far (heap root = current worst of the kept k).
  */
private[functions] final class TopKBuffer(
    val heap: java.util.PriorityQueue[(UnsafeRow, UnsafeRow)])

/** top_k_by_order(value: struct, ordering: struct, k) — the k rows whose
  * ordering structs are the lexicographic minima, returned as an array
  * sorted ascending by ordering.
  *
  * The standard formulation, `row_number() OVER (PARTITION BY key ORDER
  * BY o) <= k`, shuffles EVERY row of every group and sorts whole
  * partitions to keep k of them. This aggregate keeps a k-bounded heap
  * per key inside a hash aggregation: map-side partial combine ships at
  * most k rows per key per split, and nothing is ever globally sorted —
  * the generalization of [[FirstByOrder]] (k = 1) to per-group top-k,
  * same ObjectHashAggregateExec physical shape (SURVEY.md §2 O6).
  */
case class TopKByOrder(
    valueExpr: Expression,
    orderExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, orderExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(valueExpr.dataType, containsNull = true)

  private lazy val orderType = orderExpr.dataType.asInstanceOf[StructType]
  private lazy val valueType = valueExpr.dataType.asInstanceOf[StructType]
  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(orderType)
  @transient private lazy val orderProj = UnsafeProjection.create(orderType)
  @transient private lazy val valueProj = UnsafeProjection.create(valueType)
  // max-heap on the ordering: head = worst kept row, evicted first
  @transient private lazy val heapCmp =
    new java.util.Comparator[(UnsafeRow, UnsafeRow)] {
      override def compare(a: (UnsafeRow, UnsafeRow), b: (UnsafeRow, UnsafeRow)): Int =
        -ordering.compare(a._1, b._1)
    }

  private def newHeap() = new java.util.PriorityQueue[(UnsafeRow, UnsafeRow)](k, heapCmp)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(newHeap())

  private def offer(buf: TopKBuffer, o: UnsafeRow, v: UnsafeRow): Unit = {
    if (buf.heap.size < k) buf.heap.offer((o, v))
    else if (ordering.compare(o, buf.heap.peek()._1) < 0) {
      buf.heap.poll()
      buf.heap.offer((o, v))
    }
  }

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = orderExpr.eval(input)
    if (o != null) {
      val oRow = orderProj(o.asInstanceOf[InternalRow]).copy()
      val v = valueExpr.eval(input)
      val vRow =
        if (v == null) null else valueProj(v.asInstanceOf[InternalRow]).copy()
      offer(buf, oRow, vRow)
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val (o, v) = it.next()
      offer(buf, o, v)
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val arr = buf.heap.toArray(Array.empty[(UnsafeRow, UnsafeRow)])
    java.util.Arrays.sort(arr,
      new java.util.Comparator[(UnsafeRow, UnsafeRow)] {
        override def compare(a: (UnsafeRow, UnsafeRow), b: (UnsafeRow, UnsafeRow)): Int =
          ordering.compare(a._1, b._1)
      })
    new GenericArrayData(arr.map(_._2: Any))
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val entries = buf.heap.toArray(Array.empty[(UnsafeRow, UnsafeRow)])
    var size = 4
    entries.foreach { case (o, v) =>
      size += 8 + o.getBytes.length + (if (v == null) 0 else v.getBytes.length)
    }
    val out = java.nio.ByteBuffer.allocate(size)
    out.putInt(entries.length)
    entries.foreach { case (o, v) =>
      val ob = o.getBytes
      out.putInt(ob.length).put(ob)
      if (v == null) out.putInt(-1)
      else {
        val vb = v.getBytes
        out.putInt(vb.length).put(vb)
      }
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = new TopKBuffer(newHeap())
    if (bytes.isEmpty) return buf
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val ob = new Array[Byte](in.getInt); in.get(ob)
      val oRow = new UnsafeRow(orderType.length)
      oRow.pointTo(ob, ob.length)
      val vLen = in.getInt
      val vRow = if (vLen < 0) null else {
        val vb = new Array[Byte](vLen); in.get(vb)
        val r = new UnsafeRow(valueType.length)
        r.pointTo(vb, vb.length)
        r
      }
      buf.heap.offer((oRow, vRow))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByOrder =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByOrder =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), orderExpr = newChildren(1))
}

object TopKByOrder {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  /** top_k_by_order(value, ordering, k) as an aggregate Column. */
  def top_k_by_order(value: Column, ordering: Column, k: Int): Column =
    toColumn(TopKByOrder(toExpression(value), toExpression(ordering), k)
      .toAggregateExpression())
}
