package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for constructing a DataFrame from a custom LogicalPlan.
  * `Dataset.ofRows` is `private[sql]`, so — like other Spark extension
  * libraries (Delta, Sedona, the Iceberg runtime) — we expose it through
  * a one-liner in an `org.apache.spark.sql` subpackage. This is the only
  * place the library steps outside the public API surface.
  */
object PlanOps {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
