package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` seam this library needs: constructing a DataFrame
  * from a custom [[LogicalPlan]] node. `Dataset.ofRows` is the canonical
  * entry (it runs the analyzer and wires a QueryExecution) but is
  * `private[sql]`, so this shim lives under `org.apache.spark.sql` — the
  * standard technique for Spark extension libraries that add whole-plan
  * operators. Nothing else in graft reaches into Spark internals' private
  * scope.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
