package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a single-space-separated text, as a
  * native expression.
  *
  * The composable form (slice + zip_with + array_distinct) measures
  * ~440 µs/document: higher-order functions evaluate interpreted, per
  * element, with intermediate arrays per step. This expression does one
  * pass over the string (~10 µs/doc), preserving first-occurrence order
  * exactly like `array_distinct` so results are plan-for-plan identical
  * to the composable form (asserted in TextSpec).
  *
  * Eval-only (CodegenFallback): the operator's cost is the string
  * assembly itself, not expression dispatch, so codegen would add little;
  * it feeds `explode` immediately, so no long codegen span is broken.
  */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text   = input.asInstanceOf[UTF8String].toString
    val tokens = text.split(' ')
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((tokens.length - n + 1) * 2)
    val sb   = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it  = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {
  def shinglesNative(text: Column, n: Int): Column =
    Bridge.column(ShingleArray(Bridge.expression(text), n))
}
