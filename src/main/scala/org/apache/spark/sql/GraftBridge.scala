package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for constructing a DataFrame from a custom LogicalPlan.
  * `Dataset.ofRows` is private[sql] in Spark 4, so third-party operators
  * (graft.plans.AsOfJoin) reach it through this one-file shim in the
  * org.apache.spark.sql package — the established technique for
  * libraries adding logical plans without forking Spark.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
