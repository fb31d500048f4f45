package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the sql-package-private `Dataset.ofRows` — the standard
  * hook for constructing a DataFrame over a custom [[LogicalPlan]]
  * (used by graft.plans.AsOfJoinNode). Spark exposes custom logical
  * nodes through SparkSessionExtensions strategies but offers no public
  * constructor for a Dataset over one; every extension library bridges
  * here. Kept to this single forwarding call. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column over a raw catalyst Expression (sql-package-private in
    * Spark 4) — lets a Rule build a reference Column-API expression
    * tree around an existing plan node (e.g. a lambda variable) for
    * structural comparison. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse of [[columnOf]]: the catalyst Expression behind a Column
    * (Column.expr is sql-package-private in Spark 4). */
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
