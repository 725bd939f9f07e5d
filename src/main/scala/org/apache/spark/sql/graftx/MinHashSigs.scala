package org.apache.spark.sql.graftx

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate: for each of `numHashes`
  * permutations k, the minimum of `md5("k|" || value)` hex over the group
  * — byte-identical to K separate `min(md5(concat("k|", v)))` aggregates
  * (the oracle-checkable md5 min-hash family, `graft.operators.Dedup`),
  * but hashing each input row once per permutation in a single buffer
  * pass instead of K independent aggregate pipelines.
  *
  * TypedImperativeAggregate: the buffer is the K current minima;
  * partial-merge is elementwise min, so the result is order-independent.
  */
case class MinHashSigs(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[String]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def md5Hex(s: String): String = {
    val d  = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def createAggregationBuffer(): Array[String] = new Array[String](numHashes)

  override def update(buffer: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val s = v.asInstanceOf[UTF8String].toString
    var k = 0
    while (k < numHashes) {
      val h = md5Hex(s"$k|$s")
      if (buffer(k) == null || h.compareTo(buffer(k)) < 0) buffer(k) = h
      k += 1
    }
    buffer
  }

  override def merge(b1: Array[String], b2: Array[String]): Array[String] = {
    var k = 0
    while (k < numHashes) {
      if (b1(k) == null || (b2(k) != null && b2(k).compareTo(b1(k)) < 0)) b1(k) = b2(k)
      k += 1
    }
    b1
  }

  override def eval(buffer: Array[String]): Any =
    new GenericArrayData(buffer.map(s => if (s == null) null else UTF8String.fromString(s)))

  override def serialize(buffer: Array[String]): Array[Byte] = {
    // hex strings contain no '\n'; nulls encode as empty
    buffer.map(s => if (s == null) "" else s)
      .mkString("\n").getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val parts = new String(bytes, StandardCharsets.UTF_8).split("\n", -1)
    parts.map(s => if (s.isEmpty) null else s)
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
