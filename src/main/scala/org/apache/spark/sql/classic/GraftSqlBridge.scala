package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Compile-time bridge into `private[sql]` surface: building a
  * DataFrame from a custom [[LogicalPlan]] node (the documented
  * extension path — SparkSessionExtensions injects the strategy, but
  * constructing the logical node still needs `Dataset.ofRows`).
  * Lives in the `org.apache.spark.sql.classic` package solely to
  * satisfy the access modifier; no Spark internals are modified.
  */
object GraftSqlBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
