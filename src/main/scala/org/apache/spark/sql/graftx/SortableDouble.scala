package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lossless, order-preserving double → 16-char-hex-string encoding (and
  * its exact inverse), so a DOUBLE ordering can ride through string-keyed
  * bounded-top-k machinery ([[TopKPairs]]) without quantization.
  *
  * The IEEE-754 total-order trick: reinterpret the double as its raw sign
  * + magnitude bits, flip the sign bit for non-negatives and ALL bits for
  * negatives — the resulting unsigned 64-bit integers compare exactly
  * like the doubles they came from. Fixed-width lowercase hex of that
  * unsigned value then compares bytewise in the same order (UTF8String
  * binary order == unsigned numeric order for fixed-width hex). With
  * `descending = true` the transformed bits are complemented first, so
  * SMALLER keys mean LARGER doubles — exactly what a k-smallest-keys
  * top-k needs to deliver a top-k-by-value-DESC.
  *
  * This is what lets q37's brute-force cosine top-k drop its
  * `row_number().over(Window.partitionBy(query_id))` funnel (every
  * corpus candidate of one query through ONE task) for the bounded-heap
  * [[TopKPairs]] aggregate while still emitting the EXACT double cosine:
  * encode is bijective on bit patterns, so decode returns the original
  * double bit-for-bit — no oracle drift.
  *
  * Corner cases: NaN sorts above +Inf (IEEE total order); -0.0 sorts
  * strictly below +0.0 (engines treat them equal and tie-break
  * elsewhere — only observable if both zeros collide at the k boundary).
  * Callers here guard NaN/null upstream (cosine is CASE-guarded on
  * positive norms).
  *
  * Eval-only (CodegenFallback): it feeds an ObjectHashAggregate whose
  * input side is already interpreted HOF arithmetic; codegen would not
  * extend any span.
  */
case class DoubleSortKey(child: Expression, descending: Boolean)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    val asc  = if (bits >= 0L) bits ^ java.lang.Long.MIN_VALUE else ~bits
    val key  = if (descending) ~asc else asc
    val hex  = java.lang.Long.toHexString(key)
    val sb   = new java.lang.StringBuilder(16)
    var i = hex.length
    while (i < 16) { sb.append('0'); i += 1 }
    sb.append(hex)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact inverse of [[DoubleSortKey]]: 16-char hex key → the original
  * double, bit-for-bit. Non-hex input fails loudly (parse exception) —
  * a wrong-key bug must never decode to a plausible number.
  */
case class DoubleSortKeyDecode(child: Expression, descending: Boolean)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val key  = java.lang.Long.parseUnsignedLong(input.asInstanceOf[UTF8String].toString, 16)
    val asc  = if (descending) ~key else key
    val bits = if (asc < 0L) asc ^ java.lang.Long.MIN_VALUE else ~asc
    java.lang.Double.longBitsToDouble(bits)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortableDouble {
  /** 16-hex-char key whose ASCENDING binary order equals `v` DESCENDING. */
  def sortKeyDesc(v: Column): Column =
    Bridge.column(DoubleSortKey(Bridge.expression(v), descending = true))

  /** Inverse of [[sortKeyDesc]] — the original double, exactly. */
  def decodeDesc(key: Column): Column =
    Bridge.column(DoubleSortKeyDecode(Bridge.expression(key), descending = true))
}
