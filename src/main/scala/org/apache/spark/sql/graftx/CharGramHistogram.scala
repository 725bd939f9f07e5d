package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The stride-1 character k-gram histogram of a string: one `(g, c)`
  * struct per DISTINCT k-gram, ordered by `g` — [[CharHistogram]]
  * generalized from unigrams (k = 1 reproduces it exactly) to the
  * bigram counts behind the q233 entropy-RATE filter.
  *
  * Why not `CharGramArray(text, k)` + explode + groupBy: that shape is
  * the q211 row-amplification lesson verbatim — a 10 KB document becomes
  * 10⁴ gram rows before the partial agg collapses them. One native pass
  * computes the same counts with zero amplification, and the downstream
  * per-doc entropy fold stays a `functions.aggregate` over the
  * ≤|alphabet|^k-element array (in practice ≪ text length for k ≤ 2 —
  * natural text reuses bigrams heavily; that reuse is exactly the signal
  * the entropy rate measures).
  *
  * Windowing is by Unicode CODE POINT ([[CharGramArray]]'s rule):
  * DuckDB's `substr`/`length` count code points, so UTF-16 windows would
  * shift grams (and split surrogate pairs) on any non-BMP character and
  * diverge from the oracle.
  *
  * Eval-only (CodegenFallback): runs once per row in a projection and
  * allocates the result array either way — ShingleArray's rationale.
  */
case class CharGramHistogram(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k >= 1, "CharGramHistogram needs k >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = false),
                   StructField("c", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
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
    val counts = new java.util.TreeMap[String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val g = text.substring(offsets(i), offsets(i + k))
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramHistogram {
  /** `(g, c)` structs per distinct stride-1 char k-gram, ordered by g. */
  def charGramHistogram(text: Column, k: Int): Column =
    Bridge.column(CharGramHistogram(Bridge.expression(text), k))
}
