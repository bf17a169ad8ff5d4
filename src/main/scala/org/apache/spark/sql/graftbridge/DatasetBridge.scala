package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Bridge into Spark's private[sql] Dataset constructor — the standard
  * extension-library technique for returning a custom logical node (e.g.
  * [[graft.plans.TopKPerKey]]) through the public DataFrame API. The
  * analyzer resolves the node's expressions against its child exactly as
  * it does for built-in nodes, so callers hand in unresolved Columns. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
