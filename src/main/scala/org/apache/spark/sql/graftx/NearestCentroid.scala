package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Nearest-centroid assignment for IVF: given a vector and its
  * pre-computed norm, return the id of the centroid with the highest
  * cosine similarity (ties and the all-degenerate case resolve to the
  * smallest centroid id — centroids are iterated in ascending-id order
  * with a strict `>` update).
  *
  * The composable form — `array_max(array(struct(sim_c, -id_c) for each
  * c))` with per-centroid literal arrays — embeds nlist × dims literal
  * nodes in the plan; at nlist=16, dims=64 that is >1k expression nodes
  * whose codegen + JIT compile dominates the query on anything but huge
  * inputs (the SimhashAgg lesson). Here the centroid matrix rides along
  * as a codegen reference object, so the generated code is one short
  * nested loop regardless of nlist — and the arithmetic (left-to-right
  * dot fold, `d / (nrm * cnrm)`, -∞ for zero norms) is bit-identical to
  * the composable form, which SimilaritySpec asserts.
  */
case class NearestCentroid(
    left: Expression,  // array<double> vector
    right: Expression, // double: pre-computed vector norm
    ids: Array[Long],
    cvs: Array[Array[Double]],
    cnrms: Array[Double])
    extends BinaryExpression with ExpectsInputTypes {

  require(ids.length > 0 && ids.length == cvs.length && ids.length == cnrms.length)
  require((1 until ids.length).forall(i => ids(i - 1) < ids(i)),
    "centroid ids must be ascending (tie-break contract)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), DoubleType)

  override def dataType: DataType = LongType

  override protected def nullSafeEval(vAny: Any, nAny: Any): Any = {
    val v   = vAny.asInstanceOf[ArrayData]
    val nrm = nAny.asInstanceOf[Double]
    var bestSim = Double.NegativeInfinity
    var bestId  = ids(0)
    var c = 0
    while (c < ids.length) {
      val cv = cvs(c)
      val m  = math.min(v.numElements(), cv.length)
      var s  = 0.0
      var i  = 0
      while (i < m) { s += v.getDouble(i) * cv(i); i += 1 }
      val sim =
        if (nrm > 0 && cnrms(c) > 0) s / (nrm * cnrms(c))
        else Double.NegativeInfinity
      if (sim > bestSim) { bestSim = sim; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val idsRef   = ctx.addReferenceObj("ncIds", ids, "long[]")
      val cvsRef   = ctx.addReferenceObj("ncCvs", cvs, "double[][]")
      val cnrmsRef = ctx.addReferenceObj("ncNrms", cnrms, "double[]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val s = ctx.freshName("s")
      val cv = ctx.freshName("cv"); val sim = ctx.freshName("sim")
      val bestSim = ctx.freshName("bestSim"); val bestId = ctx.freshName("bestId")
      s"""
         |double $bestSim = Double.NEGATIVE_INFINITY;
         |long $bestId = $idsRef[0];
         |for (int $c = 0; $c < $idsRef.length; $c++) {
         |  double[] $cv = $cvsRef[$c];
         |  int $m = java.lang.Math.min($v.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += $v.getDouble($i) * $cv[$i];
         |  }
         |  double $sim = ($nrm > 0 && $cnrmsRef[$c] > 0)
         |    ? $s / ($nrm * $cnrmsRef[$c]) : Double.NEGATIVE_INFINITY;
         |  if ($sim > $bestSim) { $bestSim = $sim; $bestId = $idsRef[$c]; }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  /** Column-API entry point. `cents` = (id, centroid, norm), any order. */
  def nearest(vec: Column, nrm: Column, cents: Seq[(Long, Array[Double], Double)]): Column = {
    val sorted = cents.sortBy(_._1)
    Bridge.column(NearestCentroid(
      Bridge.expression(vec), Bridge.expression(nrm),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, sorted.map(_._3).toArray))
  }
}
