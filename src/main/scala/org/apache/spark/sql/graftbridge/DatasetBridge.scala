package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Wrap an analyzed LogicalPlan back into a DataFrame (Spark 4 keeps
  * `Dataset.ofRows` `private[sql]`). Used by optimizer rules that build
  * their rewritten subtree with the DataFrame API instead of hand-built
  * Catalyst nodes — attribute ids of pass-through columns are preserved,
  * which is what makes the rewrite output-compatible with the original
  * operator.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
