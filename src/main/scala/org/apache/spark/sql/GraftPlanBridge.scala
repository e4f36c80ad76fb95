package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge from raw Catalyst LogicalPlans to the public DataFrame API
  * (`classic.Dataset.ofRows` is private[sql]; extension libraries
  * conventionally shim it from inside the package — the same pattern as
  * [[GraftColumnBridge]] and Delta/Frameless). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
