package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Buffer: the currently-winning (ordering, value) pair. */
private[functions] final class FirstByBuffer(
    var order: UnsafeRow, var value: UnsafeRow)

/** first_by_order(value: struct, ordering: struct) — the row whose
  * ordering struct is the lexicographic minimum.
  *
  * Built-in `min_by`/`min(struct)` plan as SortAggregate for struct
  * buffers (immutable buffer types), which sorts every map partition.
  * As a TypedImperativeAggregate this runs in ObjectHashAggregateExec:
  * hash table keyed by group, one compare-and-swap per row, no sort —
  * with Spark's built-in fallback to sorting under memory pressure.
  * This is the engine's core dedup aggregate (SURVEY.md §2 O6): winner
  * selection per key in one hash pass with map-side partial combine.
  */
case class FirstByOrder(
    valueExpr: Expression,
    orderExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FirstByBuffer] {

  override def children: Seq[Expression] = Seq(valueExpr, orderExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType

  private lazy val orderType = orderExpr.dataType.asInstanceOf[StructType]
  private lazy val valueType = valueExpr.dataType.asInstanceOf[StructType]
  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(orderType)
  @transient private lazy val orderProj =
    UnsafeProjection.create(orderType)
  @transient private lazy val valueProj =
    UnsafeProjection.create(valueType)

  override def createAggregationBuffer(): FirstByBuffer = new FirstByBuffer(null, null)

  override def update(buf: FirstByBuffer, input: InternalRow): FirstByBuffer = {
    val o = orderExpr.eval(input)
    if (o != null) {
      val oRow = o.asInstanceOf[InternalRow]
      if (buf.order == null || ordering.compare(oRow, buf.order) < 0) {
        buf.order = orderProj(oRow).copy()
        val v = valueExpr.eval(input)
        buf.value =
          if (v == null) null else valueProj(v.asInstanceOf[InternalRow]).copy()
      }
    }
    buf
  }

  override def merge(buf: FirstByBuffer, other: FirstByBuffer): FirstByBuffer = {
    if (other.order != null &&
        (buf.order == null || ordering.compare(other.order, buf.order) < 0)) {
      buf.order = other.order
      buf.value = other.value
    }
    buf
  }

  override def eval(buf: FirstByBuffer): Any = buf.value

  override def serialize(buf: FirstByBuffer): Array[Byte] = {
    if (buf.order == null) return Array.emptyByteArray
    val o = buf.order.getBytes
    val v = if (buf.value == null) Array.emptyByteArray else buf.value.getBytes
    val out = java.nio.ByteBuffer.allocate(8 + o.length + v.length)
    out.putInt(o.length).put(o).putInt(v.length).put(v)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): FirstByBuffer = {
    if (bytes.isEmpty) return new FirstByBuffer(null, null)
    val in = java.nio.ByteBuffer.wrap(bytes)
    val o = new Array[Byte](in.getInt); in.get(o)
    val vLen = in.getInt
    val oRow = new UnsafeRow(orderType.length)
    oRow.pointTo(o, o.length)
    val vRow = if (vLen == 0) null else {
      val v = new Array[Byte](vLen); in.get(v)
      val r = new UnsafeRow(valueType.length)
      r.pointTo(v, v.length)
      r
    }
    new FirstByBuffer(oRow, vRow)
  }

  override def withNewMutableAggBufferOffset(offset: Int): FirstByOrder =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FirstByOrder =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), orderExpr = newChildren(1))
}

object FirstByOrder {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  /** first_by_order(value, ordering) as an aggregate Column. */
  def first_by_order(value: Column, ordering: Column): Column =
    toColumn(FirstByOrder(toExpression(value), toExpression(ordering))
      .toAggregateExpression())
}
