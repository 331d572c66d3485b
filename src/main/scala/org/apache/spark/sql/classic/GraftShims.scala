package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge into `private[sql]` Spark internals the DML extension
  * needs (the standard connector pattern — a connector that rewrites
  * UPDATE/MERGE must turn an analyzed source plan back into a
  * DataFrame, and `Dataset.ofRows` is the only door). Nothing else
  * crosses this boundary.
  */
object GraftShims {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
