package org.apache.spark.sql.graftx

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate using the Kirsch–Mitzenmacher
  * construction (ESA'06, public): each input value is md5-hashed ONCE;
  * permutation k's hash is `(h1 + k·h2) mod 2^32`, where h1/h2 are the
  * first/second 4 bytes of the digest read big-endian (= the first/second
  * 8 hex digits). The signature component is the MIN of those per group.
  *
  * Versus k independent `min(md5(k || value))` aggregates this cuts the
  * hash work k-fold — at 100 TB the md5 of every shingle is the dominant
  * CPU cost of the whole MinHash pipeline — while staying exactly
  * reproducible in any engine with md5 + int64 arithmetic (the DuckDB
  * oracle recomputes h1/h2 from hex digits and takes the same mins).
  *
  * TypedImperativeAggregate: the buffer is the K current minima;
  * partial-merge is elementwise min, so the result is order-independent.
  */
case class MinHashSigs(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  // Long.MaxValue = "no input seen" sentinel; all real hashes are < 2^32.
  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val d = md5.get()
    d.reset()
    val b  = d.digest(v.asInstanceOf[UTF8String].toString.getBytes(StandardCharsets.UTF_8))
    val h1 = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    val h2 = ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) | ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    var k = 0
    while (k < numHashes) {
      val h = (h1 + k * h2) & 0xffffffffL // k·h2 < 2^35: no overflow, mod = mask
      if (h < buffer(k)) buffer(k) = h
      k += 1
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (b2(k) < b1(k)) b1(k) = b2(k)
      k += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(v =>
      if (v == Long.MaxValue) null else java.lang.Long.valueOf(v)))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  def minhashSigs(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(c), numHashes)
      .toAggregateExpression())
}
