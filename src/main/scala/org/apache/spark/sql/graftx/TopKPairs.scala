package org.apache.spark.sql.graftx

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate: keeps the `k` smallest `(key, id)` pairs per
  * group under `(key ASC, id ASC)` binary order, evaluated as a sorted
  * `array<struct<key,id>>`.
  *
  * This is the scale shape for "N rows per stratum" sampling: a
  * `row_number().over(Window.partitionBy(stratum))` funnels each stratum's
  * ENTIRE data through one task just to keep N rows (the round-2 q68
  * finding — with a handful of language strata at 100 TB that is terabytes
  * per task). As a TypedImperativeAggregate this runs under
  * ObjectHashAggregate with map-side partial aggregation: every input task
  * reduces its slice to ≤ k pairs per stratum locally, the shuffle carries
  * ≤ k·P survivor pairs, and the final merge is a k-way bounded union —
  * the textbook two-level top-N, one shuffle, no task ever holds more
  * than O(k) state per group.
  *
  * Determinism: the comparator is UTF8String binary order + long order —
  * identical to DuckDB's `ORDER BY key, id` on ASCII keys — and top-k is
  * order-insensitive, so the result is independent of partitioning and
  * task retries.
  */
case class TopKPairs(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(UTF8String, Long)]]
    with ExpectsInputTypes with BinaryLike[Expression] {

  require(k >= 1, "TopKPairs needs k >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val cmp = new java.util.Comparator[(UTF8String, Long)] {
    override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
      val c = a._1.compareTo(b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(UTF8String, Long)] =
    new java.util.TreeSet[(UTF8String, Long)](cmp)

  override def update(
      buffer: java.util.TreeSet[(UTF8String, Long)],
      input: InternalRow): java.util.TreeSet[(UTF8String, Long)] = {
    val kv = left.eval(input)
    val iv = right.eval(input)
    if (kv == null || iv == null) return buffer
    // clone: eval may return a reused/unsafe-backed buffer
    val pair = (kv.asInstanceOf[UTF8String].clone(), iv.asInstanceOf[Long])
    if (buffer.size < k) buffer.add(pair)
    else if (cmp.compare(pair, buffer.last) < 0 && buffer.add(pair))
      buffer.remove(buffer.last)
    buffer
  }

  override def merge(
      b1: java.util.TreeSet[(UTF8String, Long)],
      b2: java.util.TreeSet[(UTF8String, Long)]): java.util.TreeSet[(UTF8String, Long)] = {
    b1.addAll(b2)
    while (b1.size > k) b1.remove(b1.last)
    b1
  }

  override def eval(buffer: java.util.TreeSet[(UTF8String, Long)]): Any = {
    val rows = new Array[Any](buffer.size)
    var i = 0
    val it = buffer.iterator()
    while (it.hasNext) {
      val (key, id) = it.next()
      rows(i) = new GenericInternalRow(Array[Any](key, id))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: java.util.TreeSet[(UTF8String, Long)]): Array[Byte] = {
    var n = 4
    buffer.forEach { case (key, _) => n += 4 + key.numBytes() + 8 }
    val bb = ByteBuffer.allocate(n)
    bb.putInt(buffer.size)
    buffer.forEach { case (key, id) =>
      val b = key.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(UTF8String, Long)] = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val out = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b   = new Array[Byte](len)
      bb.get(b)
      out.add((UTF8String.fromBytes(b), bb.getLong()))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TopKPairs {
  /** `array<struct<key,id>>` of the k smallest (key, id) pairs per group,
    * sorted ascending.
    */
  def topK(key: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKPairs(Bridge.expression(key), Bridge.expression(id), k).toAggregateExpression())
}
