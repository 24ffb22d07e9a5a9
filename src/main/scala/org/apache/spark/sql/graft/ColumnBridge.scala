package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversions so
  * graft's native Catalyst expressions can be exposed as user `Column`s
  * (the Spark 3 `new Column(expr)` constructor is gone in 4.x). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a resolved logical plan as a DataFrame — lets optimizer rules
    * run bounded statistics queries over a plan fragment (the
    * `Dataset.ofRows` constructor is `private[sql]` in 4.x). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
