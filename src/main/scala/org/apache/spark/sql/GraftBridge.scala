package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's `private[sql]` Column <-> Expression conversion
 * (Spark 4 Columns are ColumnNode-backed; `classic.ExpressionUtils` is
 * the supported internal conversion — public-bytecode, sql-private in
 * Scala). Pattern per public usage in Spark-extension projects.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** DataFrame from a custom LogicalPlan (classic.Dataset.ofRows is sql-private). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
