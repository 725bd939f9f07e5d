package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): cut a string into chunks whose
  * boundaries are a pure function of LOCAL content — position `p`
  * (1-based code points, `p ≥ k`) closes a chunk iff the rolling hash of
  * the k-gram ending at `p` satisfies `H(p) % divisor == 0`; the final
  * tail (last boundary, n] closes the last chunk. One `(chunk_pos,
  * chunk_chars, chunk_text)` struct per chunk, in position order.
  *
  * Why it exists next to fixed-size chunking ([[graft.operators.Dedup.chunkFrame]],
  * q169): fixed chunk boundaries are a function of ABSOLUTE offset, so a
  * one-token insertion at the head of a mirrored page shifts every
  * boundary and zero chunks dedup against the original. CDC boundaries
  * depend only on the k code points ending at the cut, so after an edit
  * the boundary stream re-synchronizes at the first unmodified boundary
  * (~`divisor` chars in expectation) and everything downstream dedups —
  * the LBFS/FastCDC argument (Muthitacharoen et al. SOSP'01), and the
  * reason every production dedup store chunks this way. q226 MEASURES
  * the contrast rather than asserting it.
  *
  * The hash is the base-31 polynomial of the last `k` code points,
  * mod 2^32 — chosen over the repo's usual md5 because it ROLLS:
  * `H ← (H·31 + c_in − c_out·31^k) mod 2^32` is O(1) per position
  * (one native pass, no per-position digest), while staying exactly
  * replayable in the DuckDB oracle as the k-term sum
  * `Σ ascii(substr(text, p−k+j, 1))·31^(k−j) % 2^32` (DuckDB's `ascii`
  * returns the full code point; k·max_cp·31^(k−1) ≈ 3·10^16 fits BIGINT
  * for k = 8, so the oracle's un-reduced sum cannot overflow before the
  * final mod). Positions and lengths are code points, not UTF-16 units
  * ([[CharGramArray]]'s rule), so oracle `substr` arithmetic matches on
  * non-BMP input.
  *
  * Strings shorter than `k` produce a single whole-string chunk (no
  * boundary positions exist); the empty string produces an empty array.
  * A boundary AT position n emits no empty tail. Expected chunk length
  * is `divisor` chars; production CDC adds min/max chunk bounds, which
  * make boundary eligibility depend on the PREVIOUS boundary — a
  * sequential dependency deliberately omitted so the boundary set stays
  * position-local (embarrassingly parallel, window-free in SQL).
  *
  * Eval-only (CodegenFallback): one pass per row in a projection,
  * allocating the result array either way — ShingleArray's rationale.
  */
case class CdcChunkArray(child: Expression, k: Int, divisor: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k >= 1, "CdcChunkArray needs k >= 1")
  require(divisor >= 2, "CdcChunkArray needs divisor >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("chunk_pos", LongType, nullable = false),
                   StructField("chunk_chars", LongType, nullable = false),
                   StructField("chunk_text", StringType, nullable = false))),
    containsNull = false)

  private val Mask = 0xFFFFFFFFL
  // 31^k mod 2^32 — the roll-out multiplier
  private val PowK: Long = {
    var p = 1L
    var i = 0
    while (i < k) { p = (p * 31L) & Mask; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val ncp  = text.codePointCount(0, text.length)
    if (ncp == 0) return new GenericArrayData(Array.empty[Any])
    // offsets(p) = UTF-16 index of code point p (CharGramArray's walk)
    val offsets = new Array[Int](ncp + 1)
    val cps     = new Array[Int](ncp)
    var idx = 0
    var p = 0
    while (p < ncp) {
      offsets(p) = idx
      cps(p) = text.codePointAt(idx)
      idx = text.offsetByCodePoints(idx, 1)
      p += 1
    }
    offsets(ncp) = text.length
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0 // 0-based code point index of the open chunk's first cp
    var h = 0L
    p = 0
    while (p < ncp) {
      h = (h * 31L + cps(p)) & Mask
      if (p >= k) h = (h - cps(p - k) * PowK) & Mask
      // position p+1 (1-based) is boundary-eligible once p+1 >= k
      if (p + 1 >= k && h % divisor == 0) {
        chunks += new GenericInternalRow(Array[Any](
          (start + 1).toLong, (p + 1 - start).toLong,
          UTF8String.fromString(text.substring(offsets(start), offsets(p + 1)))))
        start = p + 1
      }
      p += 1
    }
    if (start < ncp) {
      chunks += new GenericInternalRow(Array[Any](
        (start + 1).toLong, (ncp - start).toLong,
        UTF8String.fromString(text.substring(offsets(start), offsets(ncp)))))
    }
    new GenericArrayData(chunks.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunkArray {
  /** Position-ordered CDC chunks of `text` under (k, divisor). */
  def cdcChunks(text: Column, k: Int, divisor: Int): Column =
    Bridge.column(CdcChunkArray(Bridge.expression(text), k, divisor))

  /** The oracle's k-term polynomial for the gram ENDING at column `p`
    * over column `text` — the same base-31 / mod-2^32 derivation the
    * rolling walk computes, generated from ONE builder so the two
    * engines can never drift independently (the ZOrder discipline).
    */
  def boundaryHashSql(k: Int, textCol: String = "text", posCol: String = "p"): String = {
    val terms = (1 to k).map { j =>
      var pw = 1L
      var i = 0
      while (i < k - j) { pw *= 31L; i += 1 }
      s"CAST(ascii(substr($textCol, CAST($posCol - ${k - j} AS INTEGER), 1)) AS BIGINT) * $pw"
    }
    terms.mkString("((", " + ", ") % 4294967296)")
  }
}
