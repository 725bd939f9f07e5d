package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL stride-1 character k-grams of a string, in position order — the
  * anchor stream for substring-level exact dedup (q128): a document pair
  * shares a verbatim substring of length ≥ k IFF it shares at least one
  * k-gram, and gram index i is exactly 1-based start position i+1, which
  * is what lets coverage spans be reconstructed after the match join.
  *
  * Unlike [[ShingleArray]] (distinct WORD n-grams for set-similarity),
  * this keeps duplicates and order — positions are the payload. The
  * composable form (`transform(sequence(1, len-k+1), i -> substring(text,
  * i, k))`) evaluates interpreted per element with a per-gram
  * ArrayData allocation, and `sequence(1, n)` needs a CASE guard for
  * short strings (it REVERSES when n < 1); one native pass avoids both.
  *
  * Indexing is by Unicode CODE POINT, not UTF-16 code unit — DuckDB's
  * `substr`/`length` count code points, so windowing on Java char
  * indices would shift every gram and position (and could split a
  * surrogate pair) the moment a document contains a non-BMP character.
  *
  * Eval-only (CodegenFallback): feeds `posexplode` immediately —
  * ShingleArray's rationale.
  */
case class CharGramArray(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k >= 1, "CharGramArray needs k >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // code-point boundaries: offsets(p) = UTF-16 index of code point p
    val cp = text.codePointCount(0, text.length)
    val n  = cp - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val offsets = new Array[Int](cp + 1)
    var idx = 0
    var p = 0
    while (p < cp) {
      offsets(p) = idx
      idx = text.offsetByCodePoints(idx, 1)
      p += 1
    }
    offsets(cp) = text.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromString(text.substring(offsets(i), offsets(i + k)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramArray {
  /** Position-ordered stride-1 char k-grams; index i ↔ 1-based pos i+1. */
  def charGrams(text: Column, k: Int): Column =
    Bridge.column(CharGramArray(Bridge.expression(text), k))
}
