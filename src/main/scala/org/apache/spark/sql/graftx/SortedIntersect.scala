package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** A ∩ B for two ASCENDING-SORTED long arrays with distinct elements
  * (oriented adjacency lists — `sort_array(collect_list(...))` upstream
  * guarantees both preconditions), via a primitive two-pointer merge
  * walk.
  *
  * Why not `array_intersect`: its generic path builds a hash set of
  * BOXED elements per row and allocates through interpreted collection
  * machinery — on q123's triangle counting (one intersection per
  * oriented EDGE, m rows) that churn measured as 3.5–4.3 s of GC per
  * ~4.8 s warm sample, i.e. the query's cost was mostly garbage. The
  * merge walk does zero hashing and exactly two allocations per row
  * (the primitive scratch + the result), cutting the allocation rate by
  * the average adjacency length.
  *
  * The precondition is the caller's contract (ascending, distinct): on
  * unsorted input the walk silently under-counts, so the ONLY producer
  * is the sorted-adjacency build in `operators.Graph` — and
  * PropertySpec pins equivalence with `array_intersect` on sorted
  * random arrays.
  *
  * Eval-only (CodegenFallback): feeds `explode` immediately —
  * ShingleArray's rationale.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  /** Intersection of two ascending-sorted distinct long arrays. */
  def sortedIntersect(a: Column, b: Column): Column =
    Bridge.column(SortedIntersect(Bridge.expression(a), Bridge.expression(b)))
}
