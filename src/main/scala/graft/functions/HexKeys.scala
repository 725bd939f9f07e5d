package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The md5-hex-digit decoding idiom shared by every deterministic-key
  * operator (train/val/test split, weighted sampling, bloom positions,
  * CMS/winnowing hashes, stratified sample keys): hex digits extracted
  * with ascii arithmetic, which is portable to the DuckDB oracle without
  * `conv()`. One definition — Column form for the Spark side, string form
  * for the oracle SQL — so the two can never drift independently.
  */
object HexKeys {

  /** i-th hex digit (0-based) of a lowercase-hex column as an int 0..15. */
  def digit(hex: Column, i: Int): Column = {
    val a = ascii(substring(hex, i + 1, 1))
    when(a <= 57, a - 48).otherwise(a - 87)
  }

  /** Hex digits [from, from+4) as an integer in [0, 65536) — the building
    * block for Kirsch–Mitzenmacher hash pairs and md5 bucket keys.
    */
  def value16(hex: Column, from: Int = 0): Column =
    digit(hex, from) * 4096 + digit(hex, from + 1) * 256 +
      digit(hex, from + 2) * 16 + digit(hex, from + 3)

  /** Hex digits [from, from+8) as a BIGINT in [0, 2^32) — the 32-bit
    * big-endian md5 prefix `graftx.KmvDistinct` hashes with, decodable
    * from a kept hex-string key (so KMV minima that rode a string-keyed
    * bounded heap recover the numeric estimator input).
    */
  def value32(hex: Column, from: Int = 0): Column =
    (0 until 8).map(j => digit(hex, from + j).cast("long") * (1L << (4 * (7 - j))))
      .reduce(_ + _)

  /** SQL form of [[value32]]. */
  def value32Sql(from: Int = 0, hexCol: String = "hex"): String =
    (0 until 8).map { j =>
      s"CAST(${digitSql(from + j, hexCol)} AS BIGINT) * ${1L << (4 * (7 - j))}"
    }.mkString("(", " + ", ")")

  /** Kirsch–Mitzenmacher bucket array for a depth-`d` width-`w` sketch:
    * position j = (h1 + j·h2) mod w with h1/h2 two independent 16-bit
    * slices of one md5 — ONE hash per key, d derived positions (the same
    * derivation MinHashSigs uses). Shared by the batch CMS (q89) and the
    * streaming sketch.
    */
  def kmBuckets(hex: Column, depth: Int, width: Int): Column = {
    val h1 = value16(hex, 0)
    val h2 = value16(hex, 4)
    array((0 until depth).map(j => (h1 + lit(j) * h2) % width): _*)
  }

  /** HyperLogLog register rank: 1-based position of the first 1-bit in
    * the `n`-hex-digit slice `[from, from+n)` of a lowercase-hex column,
    * read MSB-first; `4n+1` if the whole slice is zero. Pure hex-digit
    * arithmetic (no float log2, no bit_length builtin) so the DuckDB
    * twin [[leadRhoSql]] is character-for-character the same derivation.
    */
  def leadRho(hex: Column, from: Int, n: Int): Column = {
    def lz(d: Column) =
      when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    (n - 1 to 0 by -1).foldLeft(lit(4 * n + 1): Column) { (acc, i) =>
      val d = digit(hex, from + i)
      when(d > 0, lit(4 * i + 1) + lz(d)).otherwise(acc)
    }
  }

  /** SQL form of [[leadRho]]. */
  def leadRhoSql(from: Int, n: Int, hexCol: String = "hex"): String = {
    val arms = (0 until n).map { i =>
      val d = digitSql(from + i, hexCol)
      s"WHEN $d > 0 THEN ${4 * i + 1} + (CASE WHEN $d >= 8 THEN 0 " +
        s"WHEN $d >= 4 THEN 1 WHEN $d >= 2 THEN 2 ELSE 3 END)"
    }
    s"(CASE ${arms.mkString(" ")} ELSE ${4 * n + 1} END)"
  }

  /** SQL form of [[digit]] over a column reference `hexCol`. */
  def digitSql(i: Int, hexCol: String = "hex"): String =
    s"(CASE WHEN ascii(substring($hexCol, ${i + 1}, 1)) <= 57" +
      s" THEN ascii(substring($hexCol, ${i + 1}, 1)) - 48" +
      s" ELSE ascii(substring($hexCol, ${i + 1}, 1)) - 87 END)"

  /** SQL form of [[value16]]. */
  def value16Sql(from: Int = 0, hexCol: String = "hex"): String =
    s"(${digitSql(from, hexCol)} * 4096 + ${digitSql(from + 1, hexCol)} * 256 + " +
      s"${digitSql(from + 2, hexCol)} * 16 + ${digitSql(from + 3, hexCol)})"
}
