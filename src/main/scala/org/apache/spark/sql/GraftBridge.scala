package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column internals.
  *
  * Since the Spark 4 Column refactor (columnNodeSupport.scala) there is no
  * public API to wrap a Catalyst [[Expression]] into a [[Column]]; every
  * extension library ships a shim like this one. Kept to the two minimal
  * conversions; all graft code lives in the `graft` package and funnels
  * through here.
  */
object GraftBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a (classic) Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
