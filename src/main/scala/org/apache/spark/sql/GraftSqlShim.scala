package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one-method bridge extension libraries conventionally place in
  * the org.apache.spark.sql package: build a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows` is `private[sql]` by design, and
  * custom logical nodes — graft.plans.TopKPerKey — need exactly this
  * one door back into the public Dataset API). */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
