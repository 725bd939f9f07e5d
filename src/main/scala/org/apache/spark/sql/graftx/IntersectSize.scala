package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| for two string arrays whose elements are distinct within each
  * array (shingle sets).
  *
  * `size(array_intersect(a, b))` materializes the intersection array
  * through interpreted collection builders (~35 µs per ~50-element pair —
  * dominates candidate verification in similarity joins). This expression
  * hashes the smaller side once and counts membership (~1 µs/pair),
  * returning the identical count.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    var a = l.asInstanceOf[ArrayData]
    var b = r.asInstanceOf[ArrayData]
    if (a.numElements() > b.numElements()) { val t = a; a = b; b = t }
    val set = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { set.add(a.getUTF8String(i)); i += 1 }
    var n = 0
    var j = 0
    while (j < b.numElements()) {
      if (set.contains(b.getUTF8String(j))) n += 1
      j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectSize {
  def intersectSize(a: Column, b: Column): Column =
    Bridge.column(IntersectSize(Bridge.expression(a), Bridge.expression(b)))
}
