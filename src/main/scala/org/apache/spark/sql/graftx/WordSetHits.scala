package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of tokens that belong to a FIXED word set — the kernel of the
  * stopword-ratio scorers (language-ID profiles, quality scoring,
  * retention sweeps). Bit-identical to the composable
  * `size(filter(toks, t => array_contains(lit(words), t)))` (asserted in
  * TextSpec): null elements are never counted (array_contains yields
  * null there, which filter drops).
  *
  * Why native: the composable form is a higher-order function, so it
  * evaluates interpreted — per token, a linear array_contains scan over
  * the literal word array, re-run for every score expression that
  * references it (language-ID computes 4 profiles, and the argmax CASE
  * re-evaluates them per branch — interpreted trees get no
  * common-subexpression elimination). This expression is one hash-set
  * probe per token over a set built once per instance.
  */
case class WordSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    var c   = 0L
    var i   = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordSetHits {
  def hitsNative(tokens: Column, words: Seq[String]): Column =
    Bridge.column(WordSetHits(Bridge.expression(tokens), words))
}
