package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the Column API backend-agnostic: `Column` wraps a
  * `ColumnNode`, and the classic-backend converters
  * (`org.apache.spark.sql.classic.ExpressionUtils.column/expression`)
  * are `private[sql]`. A third-party package that ships its own codegen
  * `Expression` (graft.functions.CosineSim) still needs exactly those two
  * conversions to offer a typed Column combinator, so this one-file shim
  * re-exports them from inside the `org.apache.spark.sql` package — the
  * same access trick every Spark-extension library uses for
  * private[sql] surfaces. No Spark behavior is altered or overridden.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
