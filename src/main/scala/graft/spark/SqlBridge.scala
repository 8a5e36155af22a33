// Lives under org.apache.spark.sql so it can see the private[sql]
// Column ⇄ Expression converters — the standard technique third-party
// Spark libraries (frameless, delta, sedona, …) use to expose native
// Catalyst expressions as user-facing Columns without a UDF detour.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object SqlBridge {
  /** Wrap a raw Catalyst Expression as a Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)
  /** Unwrap a Column back to its Catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
