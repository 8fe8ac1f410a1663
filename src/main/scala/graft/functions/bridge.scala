// Bridge into the private[sql] Column<->Expression conversion API —
// the documented pattern for third-party Catalyst expressions that want a
// typed Column DSL (the alternative, SQL-registry-only access, would force
// every caller through expr() strings).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
