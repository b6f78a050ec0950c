package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k largest (sortVal, tieBreak)
  * pairs per group in a size-k heap with map-side partial merge.
  *
  * The declarative alternative — `row_number().over(partitionBy(key)
  * .orderBy(v.desc)) <= k` — SORTS every partition in full: at 100 TB
  * that is a total shuffle + sort of the fact table to keep 3 rows per
  * key. This aggregate ships at most k tuples per key per map task,
  * so the shuffle is O(keys · k) regardless of input size.
  *
  * Returns array<struct<sort_val double, tie long>> ordered descending
  * by (sort_val, then ascending tie) — explode with posexplode for
  * ranks.
  */
case class TopKByAggregate(
    sortChild: Expression,
    tieChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  private def heapOrder = TopKByAggregate.HeapOrder

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, heapOrder)

  private def offer(buf: java.util.PriorityQueue[(Double, Long)],
      v: Double, t: Long): Unit = {
    if (buf.size < k) buf.offer((v, t))
    else if (heapOrder.compare((v, t), buf.peek()) > 0) {
      buf.poll(); buf.offer((v, t))
    }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long)],
      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val sv = sortChild.eval(input)
    val tv = tieChild.eval(input)
    if (sv != null && tv != null) {
      offer(buf, sv.asInstanceOf[Double], tv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Double, Long)],
      other: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (v, t) = it.next(); offer(buf, v, t) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = buf.toArray(Array.empty[(Double, Long)])
      .sortBy { case (v, t) => (-v, t) }
    new GenericArrayData(arr.map { case (v, t) =>
      InternalRow(v, t)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (v, t) = it.next(); bb.putDouble(v); bb.putLong(t) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.offer((bb.getDouble, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sort_val", DoubleType, nullable = false),
      StructField("tie", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(sortChild, tieChild)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAggregate =
    copy(sortChild = newChildren(0), tieChild = newChildren(1))
}

object TopKByAggregate {
  // min-heap order for the current top-k: worst element on top for
  // O(log k) replacement — lower value first, or same value with
  // larger tie. Serializable: the aggregate ships to executors.
  val HeapOrder: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] with Serializable {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }
}

object TopKAggregate {
  /** `top_k_by(sort, tie, k)`: k largest (sort, tie) pairs per group,
    * descending — a Column wrapping the typed imperative aggregate.
    */
  def top_k_by(sort: Column, tie: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByAggregate(ColumnBridge.expression(sort.cast("double")),
        ColumnBridge.expression(tie.cast("long")), k).toAggregateExpression())
}
