package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4 moved `Column` to the engine-agnostic sql-api module; wrapping a
  * Catalyst `Expression` goes through `classic.ExpressionUtils`, which is
  * `private[sql]` — this object lives under `org.apache.spark.sql` to
  * re-export just the two conversions the graft expression library needs.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
