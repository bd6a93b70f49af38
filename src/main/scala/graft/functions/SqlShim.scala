// Interop shim: Spark 4 made Column a ColumnNode wrapper and the
// Expression<->Column converters private[sql]. This is the minimal,
// conventional bridge for libraries shipping native Catalyst
// expressions — nothing else lives in this package.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** DataFrame over a custom LogicalPlan (Dataset.ofRows is private[sql]). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
