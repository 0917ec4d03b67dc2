package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for `private[sql]` plan→DataFrame construction — the
  * standard OSS Spark-connector shim pattern (Delta Lake and Iceberg ship
  * the same kind of `org.apache.spark.sql.*` bridge). Used by the graft
  * catalog's dynamic-partition-overwrite command, which holds an already
  * analyzed query plan and needs to execute it as a regular DataFrame
  * write; no other private surface is touched.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
