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

/** Bridge into private[sql] Dataset.ofRows — the documented pattern for
  * third-party commands (Delta's InsertInto/Merge commands re-plan their
  * captured logical query exactly this way). */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
