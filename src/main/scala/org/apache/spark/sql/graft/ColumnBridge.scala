package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column internals — the standard
  * extension-library technique for exposing custom Catalyst `Expression`s
  * as user-facing `Column`s on Spark 4.x, where `Column` wraps a
  * `ColumnNode` rather than an `Expression`.
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(classic.ExpressionColumnNode(e))

  /** Resolve a Column back to its Catalyst expression (classic session). */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
