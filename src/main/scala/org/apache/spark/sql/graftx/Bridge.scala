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

  /** Whether a data type supports ORDER BY (maps don't; arrays/structs of
    * orderable children do) — Catalyst's own rule, re-exported for callers
    * that build orderings over arbitrary schemas.
    */
  def isOrderable(dt: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)

  /** The MANAGED-table location the catalog would assign `table` in the
    * CURRENT database — honors `USE <db>` (`<warehouse>/<db>.db/<t>`)
    * and the catalog's case normalization, unlike hand-building
    * `<warehouse.dir>/<table>`. `sessionState.catalog` is
    * `private[sql]`, hence bridged here (used by Warehouse.writeBucketed
    * to clear orphaned locations safely).
    */
  def defaultTablePath(spark: org.apache.spark.sql.SparkSession, table: String): java.net.URI =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table))

  /** This session's unique id — only surfaced on the classic session
    * class, hence bridged. Used to session-scope shared warehouse table
    * names so two concurrent sessions over the same warehouse dir can
    * never drop/rewrite each other's tables mid-read.
    */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Register a function builder on an EXISTING session's (session-scoped)
    * function registry — the post-hoc path for sessions not built with
    * `spark.sql.extensions=graft.GraftExtensions`. `sessionState` is
    * `private[sql]`, hence bridged here.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
