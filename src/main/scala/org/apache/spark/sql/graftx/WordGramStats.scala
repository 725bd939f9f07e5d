package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics for a set of widths —
  * the whole q156/q76 per-doc aggregation computed scan-locally in one
  * pass over the row ([[CharGramHistogram]]'s q211 row-amplification
  * lesson applied to WORD grams): the retired shape exploded every
  * width's gram stream (≈ 4× the token count in rows, each carrying a
  * reconstructed gram STRING) through a corpus-wide
  * groupBy(doc, n, gram) exchange just to fold it straight back to one
  * row per (doc, n). Every statistic depends on one document only, so
  * the exchange moved ~14× the corpus text for nothing.
  *
  * Semantics (bit-for-bit the composed tree it replaces, which the
  * DuckDB oracle replays unchanged):
  *   - tokens = split(text, " ") — Java regex split, limit −1, trailing
  *     empties kept (Spark's `split` rule);
  *   - for each n in `ns` (output array order = `ns` order): grams are
  *     the m = |toks|−n+1 windows joined with a single space (counted
  *     WITH multiplicity); m ≤ 0 yields the zero row;
  *   - top gram = min over (−count, gram) with gram compared in UTF-8
  *     BYTE order (Spark/DuckDB string ordering — Java's UTF-16
  *     `compareTo` would misorder supplementary planes);
  *   - dup_chars = Σ_{count ≥ 2} count · numChars(gram), numChars in
  *     CODE POINTS (Spark `length`).
  *
  * Returns array<struct<n, n_grams, n_distinct, top_gram, top_count,
  * dup_chars>> — `inline` it; q76 reads the n = 1 row (token stats),
  * q156 the n ∈ {2..5} rows.
  *
  * Eval-only (CodegenFallback): one call per row in a projection; the
  * per-row hash map is bounded by the document's token count.
  */
case class WordGramStats(child: Expression, ns: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(ns.nonEmpty && ns.forall(_ >= 1), "WordGramStats needs widths >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(WordGramStats.entryType,
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // Java String.split(" ", -1) == Spark split(text, ' '): regex on a
    // literal space, trailing empty strings kept.
    val toks = text.split(" ", -1)
    val out = new Array[Any](ns.length)
    var ni = 0
    while (ni < ns.length) {
      val n = ns(ni)
      val m = toks.length - (n - 1)
      out(ni) =
        if (m <= 0)
          new GenericInternalRow(Array[Any](
            n.toLong, 0L, 0L, UTF8String.EMPTY_UTF8, 0L, 0L))
        else {
          val counts = new java.util.HashMap[String, Array[Long]](m * 2)
          var i = 0
          while (i < m) {
            val g =
              if (n == 1) toks(i)
              else {
                val sb = new java.lang.StringBuilder
                var j = 0
                while (j < n) {
                  if (j > 0) sb.append(' ')
                  sb.append(toks(i + j))
                  j += 1
                }
                sb.toString
              }
            val prev = counts.get(g)
            if (prev == null) counts.put(g, Array(1L)) else prev(0) += 1L
            i += 1
          }
          var topGram: String = null
          var topCnt = 0L
          var dupChars = 0L
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val g = e.getKey
            val c = e.getValue()(0)
            if (c >= 2L) dupChars += c * g.codePointCount(0, g.length).toLong
            if (c > topCnt ||
                (c == topCnt && WordGramStats.utf8Compare(g, topGram) < 0)) {
              topGram = g; topCnt = c
            }
          }
          new GenericInternalRow(Array[Any](
            n.toLong, m.toLong, counts.size.toLong,
            UTF8String.fromString(topGram), topCnt, dupChars))
        }
      ni += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramStats {

  val entryType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  /** Compare two strings in UTF-8 byte order (= code point order) — the
    * ordering Spark's UTF8String and DuckDB's binary collation use for
    * the `min(struct(-cnt, gram))` tie-break. Java `compareTo` orders by
    * UTF-16 unit, which ranks supplementary-plane code points (surrogate
    * pairs, 0xD800+) BELOW BMP chars in [0xE000, 0xFFFF].
    */
  private[graftx] def utf8Compare(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    var i = 0; var j = 0
    while (i < la && j < lb) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(la - i, lb - j)
  }

  /** One struct per width in `ns` (that order): per-document word-gram
    * repetition stats — see the class doc for the exact semantics.
    */
  def wordGramStats(text: Column, ns: Seq[Int]): Column =
    Bridge.column(WordGramStats(Bridge.expression(text), ns))
}
