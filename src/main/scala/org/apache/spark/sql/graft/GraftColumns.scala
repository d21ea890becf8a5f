package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made `ExpressionUtils` `private[sql]`, so library code
  * outside the sql package can only reach expressions through the
  * function registry (`call_function`) — which forces a session-scoped
  * registration step on every operator entry point. This shim (in the
  * same spirit as [[GraftExpectsInputTypes]]) re-exports the two
  * conversions so PURE Column combinators (e.g. the language-ID
  * stopword counter, which has no DataFrame in scope to register
  * against) can wrap a native expression directly. */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
