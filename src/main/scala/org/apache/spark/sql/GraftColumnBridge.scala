package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters, so the
  * library can lift custom codegen'd Catalyst expressions (e.g.
  * `graft.functions.FloatDot`) into the public Column API without needing a
  * session-bound function registry. Standard extension-library pattern. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
