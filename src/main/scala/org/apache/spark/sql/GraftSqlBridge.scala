package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface — the standard pattern for
  * Spark extension libraries that build custom logical plans (Column ↔
  * Expression conversion and Dataset-from-LogicalPlan construction have no
  * public equivalents in Spark 4's split API).
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eager conversion: `ExpressionUtils.expression` returns a lazy
    * `ColumnNodeExpression` wrapper whose column node is not serializable —
    * fine inside the analyzer, fatal inside a physical plan's task closure.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def logicalPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
}
