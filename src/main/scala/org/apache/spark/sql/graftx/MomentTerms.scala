package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Moment terms of a dense vector for one-pass covariance: the
  * upper-triangle second-moment products `(i, j, v_i·v_j)` for
  * `1 ≤ i ≤ j ≤ d`, followed by the first-moment terms `(i, 0, v_i)` —
  * exactly the element order of the composable
  * `concat(flatten(transform(seq, i => transform(seq_i, j => struct))),
  * transform(seq, i => struct))` form, which it must stay bit-identical
  * to (asserted in SimilaritySpec).
  *
  * Why native: the composable form runs d(d+1)/2 + d interpreted lambda
  * invocations per ROW (nested higher-order functions don't codegen),
  * each allocating a struct through the generic evaluator — measured
  * ~7 ms/row at d = 64, which made the covariance gate (q119) the
  * slowest query in the bench at 15 s. This expression builds the same
  * 2 144 structs in one tight primitive loop (~40 µs/row).
  *
  * Eval-only (CodegenFallback): the output feeds `explode` immediately,
  * so no whole-stage span is broken, and the cost is array assembly,
  * not dispatch. Input elements must be non-null (embedding contract;
  * enforced upstream by the `array<double>` cast of non-null vectors).
  */
case class MomentTerms(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("t", DoubleType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // enforce the documented non-null-element contract loudly:
    // toDoubleArray() would silently read null slots as 0.0 (or throw,
    // impl-dependent), diverging from the composable nested-transform
    // form which propagates nulls (round-7 advice).
    var z = 0
    while (z < arr.numElements()) {
      if (arr.isNullAt(z))
        throw new IllegalArgumentException(
          s"MomentTerms: null element at index $z — input vectors must be non-null")
      z += 1
    }
    val v = arr.toDoubleArray()
    val d = v.length
    val out = new Array[Any](d * (d + 1) / 2 + d)
    var k = 0
    var i = 0
    while (i < d) {
      val vi = v(i)
      var j = i
      while (j < d) {
        out(k) = new GenericInternalRow(Array[Any](i + 1, j + 1, vi * v(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < d) {
      out(k) = new GenericInternalRow(Array[Any](i + 1, 0, v(i)))
      k += 1
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MomentTerms {
  def momentTerms(v: Column): Column =
    Bridge.column(MomentTerms(Bridge.expression(v)))
}
