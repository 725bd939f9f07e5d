package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Fused per-edge triangle emit for q123's edge-iterator counting: given
  * an oriented edge (u, v) and the two ASCENDING-SORTED, distinct
  * oriented adjacency arrays N⁺(u), N⁺(v), computes k = |N⁺(u) ∩ N⁺(v)|
  * (the triangles closed over this base edge) and returns the packed
  * participation entries
  *
  *   [ pack(w₁,1), …, pack(wₖ,1), pack(u,k), pack(v,k) ]
  *
  * with `pack(node, c) = node << 21 | c` — node in the high 42 bits,
  * count in the low 21. The consumer explodes and aggregates
  * `sum(p & 0x1FFFFF) group by (p >> 21)` to get exact per-node triangle
  * counts.
  *
  * Why fused: the unfused form (SortedIntersect → concat(ws,
  * array_repeat(u,k), array_repeat(v,k)) → explode 3k rows) allocated
  * five arrays per edge and pushed 3k boxed rows through the
  * aggregation — measured as the dominant GC source of the whole bench
  * suite (q123 owned 18.9 s of 49 s serve-wide task GC at round 13).
  * This expression allocates exactly two primitive arrays per edge
  * (merge-walk scratch + result) and emits k+2 rows, with the downstream
  * shift/mask agg staying inside whole-stage codegen.
  *
  * Bit budget (both guarded at runtime, throwing rather than silently
  * corrupting): node < 2⁴² covers any TPC-H partkey scale (sf 100 000 →
  * 2×10¹⁰ ≈ 2³⁴·²) and 4T-node web graphs; count k ≤ oriented
  * out-degree ≤ O(√m) by the degree orientation, so < 2²¹ (2M) holds up
  * to m ≈ 4×10¹² edges.
  *
  * Empty intersection → empty array (explode drops the edge — no
  * separate size>0 filter needed).
  *
  * Eval-only (CodegenFallback): feeds `explode` immediately —
  * ShingleArray's rationale.
  */
case class TriPack(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(uAny: Any, vAny: Any, l: Any, r: Any): Any = {
    val u = uAny.asInstanceOf[Long]
    val v = vAny.asInstanceOf[Long]
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val scratch = new Array[Long](math.min(na, nb) + 2)
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { scratch(k) = pack(x, 1L); k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (k == 0) TriPack.Empty
    else {
      scratch(k) = pack(u, k.toLong)
      scratch(k + 1) = pack(v, k.toLong)
      new GenericArrayData(java.util.Arrays.copyOf(scratch, k + 2))
    }
  }

  private def pack(node: Long, c: Long): Long = {
    if (node < 0L || node >= TriPack.NodeBound || c >= TriPack.CountBound)
      throw new IllegalStateException(
        s"TriPack bit budget exceeded: node=$node (must be in [0, 2^42)), " +
        s"count=$c (must be < 2^21) — re-id the graph or widen the packing")
    (node << TriPack.CountBits) | c
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object TriPack {
  val CountBits = 21
  val CountMask: Long = (1L << CountBits) - 1L
  val NodeBound: Long = 1L << 42
  val CountBound: Long = 1L << CountBits
  private[graftx] val Empty = new GenericArrayData(Array.emptyLongArray)

  /** Packed triangle-participation entries for one oriented edge. */
  def triPack(u: Column, v: Column, nu: Column, nv: Column): Column =
    Bridge.column(TriPack(Bridge.expression(u), Bridge.expression(v),
                          Bridge.expression(nu), Bridge.expression(nv)))
}
