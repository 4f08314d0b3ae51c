package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim for the one `private[sql]` constructor the fence operator
  * needs: building a DataFrame from a raw LogicalPlan. Lives in the
  * `classic` package solely to satisfy that access modifier — contains no
  * logic and touches no other internals (the standard pattern for Spark
  * extensions that introduce custom logical nodes).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[org.apache.spark.sql.Row] =
    Dataset.ofRows(spark, plan)
}
