package org.apache.spark.sql.graftx

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash aggregate over string features.
  *
  * Bit b of a feature is bit (7 − b%8) of byte b/8 of md5(feature) — the
  * byte-level restatement of "bit (3 − b%4) of hex digit b/4", so the
  * result is bit-identical to the hex/ascii SQL formulation the DuckDB
  * oracle runs (`graft.queries.TextQueries` q41). The document bit is set
  * iff the ±1 bit-sum is ≥ 0, i.e. 2·ones(b) ≥ n.
  *
  * Why an imperative aggregate and not 64 SUM columns: the expression
  * form needs 16 hex-digit extractions per feature row plus a 64-term
  * bit-assembly — a generated-code surface big enough that compile/JIT
  * constants dominate the wall clock (the round-1 q41 hot spot). Here the
  * md5 runs once per feature in plain JVM code, the buffer is 64 int
  * counters + n, and partial-merge is a vector add, so the aggregate is
  * order-independent and shuffle-parallel like any SUM.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  // buffer layout: [0,64) ones-counts per bit, [64] feature count n
  override def createAggregationBuffer(): Array[Int] = new Array[Int](65)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val d = md5.get()
    d.reset()
    val bytes = d.digest(v.asInstanceOf[UTF8String].toString.getBytes(StandardCharsets.UTF_8))
    var j = 0
    while (j < 8) {
      val by = bytes(j) & 0xff
      var r = 0
      while (r < 8) {
        buffer(8 * j + r) += (by >> (7 - r)) & 1
        r += 1
      }
      j += 1
    }
    buffer(64) += 1
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 65) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    val n = buffer(64)
    if (n == 0) return null
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (2 * buffer(b) >= n) sim |= 1L << (63 - b)
      b += 1
    }
    sim
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb  = ByteBuffer.wrap(bytes)
    val out = new Array[Int](65)
    var i = 0
    while (i < 65) { out(i) = bb.getInt(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashAgg {
  def simhash64(c: Column): Column =
    Bridge.column(SimhashAgg(Bridge.expression(c)).toAggregateExpression())
}
