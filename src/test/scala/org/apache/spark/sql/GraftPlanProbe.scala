package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql]`: materialize a logical-plan
  * FRAGMENT as a DataFrame so a spec can count the rows flowing into a
  * specific operator (e.g. the input of a partition-less Window) instead
  * of only observing the query's final output. */
object GraftPlanProbe {
  def rowsOf(spark: SparkSession, plan: LogicalPlan): Long =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
      .count()
}
