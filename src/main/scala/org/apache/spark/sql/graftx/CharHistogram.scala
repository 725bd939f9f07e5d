package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The character-unigram histogram of a string: one `(ch, c)` struct per
  * DISTINCT code point, ordered by `ch` — the scan-local input to the
  * q211 entropy filter.
  *
  * Replaces the composable form `explode(sequence(1, n_chars)) +
  * substr(text, i, 1) + groupBy(doc_id, ch)` (round-12 verdict, What's
  * wrong #3): that shape amplifies a 10 KB document into 10⁴ rows before
  * the partial agg collapses them — map-side-combinable, so no shuffle
  * blowup, but pure row-amplification waste when one native pass over
  * the string computes the same counts with ZERO amplification. The
  * downstream per-doc entropy fold becomes `functions.aggregate` over
  * this ≤|alphabet|-element array — the whole operator is then
  * projection-only (no Generate, no per-char rows, nothing to shuffle).
  *
  * Counting is by Unicode CODE POINT ([[CharGramArray]]'s rule): DuckDB's
  * `substr`/`length` count code points, so counting UTF-16 units would
  * split surrogate pairs and diverge from the oracle on any non-BMP
  * character.
  *
  * Eval-only (CodegenFallback): runs once per row in a projection and
  * allocates the result array either way — ShingleArray's rationale.
  */
case class CharHistogram(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ch", StringType, nullable = false),
                   StructField("c", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.TreeMap[String, java.lang.Long]()
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val ch = new String(Character.toChars(cp))
      val prev = counts.get(ch)
      counts.put(ch, if (prev == null) 1L else prev + 1L)
      i += Character.charCount(cp)
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

object CharHistogram {
  /** `(ch, c)` structs per distinct code point, ordered by ch. */
  def charHistogram(text: Column): Column =
    Bridge.column(CharHistogram(Bridge.expression(text)))
}
