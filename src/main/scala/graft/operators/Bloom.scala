package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.sql.{Column, DataFrame}

/** The q242 Bloom-filter layout, shared by the batch semi-join audit
  * (`OlapQueries` q242) and the streaming word-table maintenance
  * (`EventsStream.bloomIndexMaintainStream`): m = 2^20 bits stored as
  * [[NumWords]] BIGINT words, k = [[K]] Kirsch–Mitzenmacher positions
  * (h1 + j·h2) mod m derived from two 32-bit md5 slices — the q83
  * derivation widened (2^16 bits saturates past ~10k keys), engine-
  * reproducible through `HexKeys` so the DuckDB oracle replays it
  * bit-for-bit.
  *
  * The word table is an OR-SEMILATTICE: bit_or is idempotent,
  * commutative, and monotone, so word rows merge correctly in any
  * order and multiplicity — the property the streaming leg's
  * batch-granular state rows rely on.
  */
object Bloom {
  /** m — filter size in bits (2^20). */
  val NumBits = 1048576L

  /** Word-table size: [[NumBits]] / 32 bits per BIGINT word's used
    * low half (the oracle's `<<` stays within positive BIGINT range).
    */
  val NumWords = 32768L

  /** k — number of probe positions per key. */
  val K = 4

  /** The k probe positions of `key` (cast to string under the 'bsj|'
    * prefix — q242's derivation, byte-identical in the oracle).
    */
  def positions(key: Column): Seq[Column] = {
    val hex = md5(concat(lit("bsj|"), key.cast(StringType)))
    val h1  = graft.functions.HexKeys.value32(hex, 0) % NumBits
    val h2  = graft.functions.HexKeys.value32(hex, 8) % NumBits
    (0 until K).map(j => (h1 + lit(j.toLong) * h2) % NumBits)
  }

  /** Fold the values of `keyCol` into the (word_idx, words) table —
    * one partial+final bit_or aggregation to ≤[[NumWords]] rows, a
    * broadcastable constant at any build size.
    */
  def words(keys: DataFrame, keyCol: String): DataFrame =
    keys.select(explode(array(positions(col(keyCol)): _*)).as("p"))
      .select(floor(col("p") / 32).cast(LongType).as("word_idx"),
              expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("mask"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(mask)").as("words"))
}
