package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the `k` lexicographically smallest
  * (key, id) pairs of the group, as an array of (key, id) structs in
  * ascending order.
  *
  * This is the shuffle-minimal shape for "first k of each stratum in a
  * deterministic order" (seeded sampling, per-group head): the partial
  * aggregation keeps at most k pairs per group per map task, so the
  * exchange carries O(groups x partitions x k) tiny rows instead of the
  * whole table, and no stratum ever funnels through a single sort
  * partition the way a global rank window does. Buffer cost is O(k) with
  * O(k) replace-the-max updates — k is a sample cap, small by
  * construction.
  */
case class TopKByKey(key: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]]
    with ImplicitCastInputTypes { // narrower integral inputs widen to long
  require(k > 0, s"invalid top-k cap $k")

  override def children: Seq[Expression] = Seq(key, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty[(Long, Long)]

  // primitive lexicographic compare — no Ordering/boxing on the per-row path
  private def lt(a1: Long, a2: Long, b1: Long, b2: Long): Boolean =
    a1 < b1 || (a1 == b1 && a2 < b2)

  private def insert(buf: ArrayBuffer[(Long, Long)],
      kv: (Long, Long)): Unit = {
    if (buf.length < k) { buf += kv; () }
    else {
      var worst = 0
      var i = 1
      while (i < buf.length) {
        val c = buf(i); val w = buf(worst)
        if (lt(w._1, w._2, c._1, c._2)) worst = i
        i += 1
      }
      val w = buf(worst)
      if (lt(kv._1, kv._2, w._1, w._2)) buf(worst) = kv
    }
  }

  override def update(buf: ArrayBuffer[(Long, Long)],
      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      insert(buf, (kv.asInstanceOf[Long], iv.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: ArrayBuffer[(Long, Long)],
      b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.sorted
      .map(p => InternalRow(p._1, p._2): Any).toArray)

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 16)
    buf.foreach { case (a, b) => bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = ArrayBuffer.empty[(Long, Long)]
    while (bb.remaining() >= 16) out += ((bb.getLong, bb.getLong))
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByKey =
    copy(key = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_by_key"
}
