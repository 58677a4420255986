package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 hides the classic converters behind
  * `private[sql]`, so libraries that construct custom Catalyst expressions
  * carrying non-SQL state (e.g. a trained centroid matrix) place this
  * one-liner in the `org.apache.spark.sql` package — the established
  * extension pattern — instead of smuggling state through a session-global
  * temp-function registry, which binds whichever registration happened
  * last at analysis time.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
