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
}
