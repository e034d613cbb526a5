package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate — the mergeable-sketch aggregation tier
  * (SURVEY.md §2.11 "TypedImperativeAggregate (mutable buffer, e.g.
  * HLL/sketches)").
  *
  * Buffer = the k smallest 64-bit hashes seen. Exact while < k distinct
  * values; beyond that the estimator (k−1)/u₍k₎ (u₍k₎ = k-th minimum as a
  * fraction of hash space) has relative error ≈ 1/√(k−2). Buffers merge by
  * union-and-truncate, so partial aggregation and shuffle-combine work like
  * any built-in aggregate — constant state per group regardless of input
  * size, which is the entire point at 100 TB (exact distinct needs a
  * shuffle of every value; this needs k longs).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  /** Hash biased by flipping the sign bit: natural (signed) ordering of the
    * stored value equals unsigned ordering of the raw hash, so a plain
    * TreeSet keeps the k unsigned-minimum hashes and
    * `stored − Long.MinValue` is the unsigned magnitude. */
  private def hash(v: Any): Long = {
    val h = v match {
      case s: UTF8String => Hashing.mix64(Hashing.fnv1a64(s.getBytes))
      case l: Long => Hashing.mix64(l)
      case i: Int => Hashing.mix64(i.toLong)
      case other => Hashing.mix64(Hashing.fnv1a64(other.toString))
    }
    h ^ Long.MinValue
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(hash(v))
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.remove(a.last)
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    if (buf.size < k) buf.size.toLong
    else {
      // u_k = k-th minimum as fraction of the unsigned 64-bit hash space
      val kth = buf.last.longValue()
      val u = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1) / math.max(u, 1e-18))
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(l => bb.putLong(l))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

object KmvSketch {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Approximate COUNT(DISTINCT c) with a k-entry mergeable sketch. */
  def kmv_distinct(c: Column, k: Int = 256): Column =
    column(KmvDistinct(expression(c), k).toAggregateExpression())
}
