package org.apache.spark.sql.graftx

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002,
  * public): hash every value uniformly to [0, 2^32) — here the first
  * 32 bits of md5, big-endian — and keep the k smallest DISTINCT hashes.
  * If fewer than k are held, that is the exact distinct count; otherwise
  * the estimator is `(k−1) · 2^32 / h_k` with `h_k` the k-th smallest.
  *
  * Why this sketch and not HyperLogLog: identical accuracy class per byte
  * of state is NOT the point — determinism is. KMV over md5 is exactly
  * reproducible in any engine (the DuckDB oracle recomputes the same k
  * minima with a window and applies the same arithmetic), so the
  * cardinality estimate itself hash-gates cross-engine, something
  * implementation-defined HLL registers can never do.
  *
  * Mergeable by construction (union the minima, keep k smallest), so
  * partial aggregation and map-side combine work like any SUM: O(k) state
  * per group at any data scale.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val d = md5.get()
    d.reset()
    val b = d.digest(v.asInstanceOf[UTF8String].toString.getBytes(StandardCharsets.UTF_8))
    val h = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    if (buffer.size < k) buffer.add(h)
    else if (h < buffer.last) {
      if (buffer.add(h)) buffer.remove(buffer.last)
    }
    buffer
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.remove(b1.last)
    b1
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    if (buffer.size < k) buffer.size.toDouble
    else (k - 1) * 4294967296.0 / buffer.last.toDouble

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    buffer.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KmvDistinct {
  def kmvDistinct(c: Column, k: Int): Column =
    Bridge.column(KmvDistinct(Bridge.expression(c), k).toAggregateExpression())
}
