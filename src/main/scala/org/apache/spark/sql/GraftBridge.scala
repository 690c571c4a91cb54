package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` surface the engine needs:
  * turning a custom [[LogicalPlan]] node (graft.plans.AsOfJoinPlan)
  * into a DataFrame so the planner can reach the custom strategy.
  * Lives in `org.apache.spark.sql` for access scope only — the
  * standard pattern for open-source Spark extension libraries.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (custom-node children). */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
