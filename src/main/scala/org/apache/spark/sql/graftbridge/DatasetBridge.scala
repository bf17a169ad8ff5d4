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

  /** Lineage cut WITHOUT materialization or row conversion: wrap the
    * frame's InternalRow RDD as a LogicalRDD leaf (stats/constraints
    * carried via LogicalRDD.fromDataset, partitioning/ordering preserved).
    * The iterative-operator replacement for the
    * `createDataFrame(df.rdd, df.schema)` idiom, which paid an
    * InternalRow -> Row -> InternalRow conversion on every downstream read
    * of every round's cache (r16 measurement: the CC round loop's
    * dominant per-row cost). The caller still owns materialization —
    * persist + an action, exactly like before. */
  def internalBarrier(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[_]]
    ofRows(df.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}
