package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface needed to expose a custom
  * LogicalPlan as a user-facing DataFrame (the same shim pattern the
  * Spark extension ecosystem uses — there is no public constructor for
  * Dataset-from-LogicalPlan).
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
