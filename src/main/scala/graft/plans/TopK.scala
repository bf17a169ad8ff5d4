package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, SortOrder}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.IntegerType

/** Direct DataFrame API over the bounded-heap top-N-per-group operator —
  * the library-adoption face of [[TopKPerKey]].
  *
  * [[TopKWindowRewrite]] serves SQL-shaped workloads (it pattern-matches
  * the `row_number … rn <= k` idiom behind a conf flag); library call
  * sites should not depend on a rewrite firing — a re-planned DataFrame
  * (every `df.write` builds a fresh QueryExecution) silently falls back
  * to `WindowExec` if the conf has been dropped meanwhile. This API puts
  * the [[TopKPerKey]] node IN the logical plan itself, so every re-plan
  * sees it and [[TopKStrategy]] plans the partial/final heap pair —
  * map-side prune to ≤ k rows per key BEFORE the exchange, k-sized heaps
  * instead of partition sorts on both sides.
  *
  * Output = `df`'s columns plus `rankCol` (IntegerType, 1-based within
  * its key by `order`) — exactly the window form's columns, drop-in for
  * `row_number().over(Window.partitionBy(keys).orderBy(order))` followed
  * by `filter(rank <= k)`. Same tie contract as the window form: with a
  * non-total `order`, which boundary tie survives is undefined there too;
  * callers wanting determinism append a tiebreaker column (both adopted
  * call sites do).
  *
  * The strategy is self-ensured on the session (idempotent), so the API
  * works on sessions built without
  * [[graft.functions.expressions.GraftExtensions]] too. */
object TopK {
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame = {
    require(keys.nonEmpty, "perKey needs at least one key")
    require(order.nonEmpty, "perKey needs an ordering")
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    // eager catalyst conversion: the node's expressions end up serialized
    // into the heap execs' task closures, so no lazy public-API wrappers
    val orderExprs = order.map(c => ColumnBridge.catalystExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val rankAttr = AttributeReference(rankCol, IntegerType, nullable = false)()
    val node = TopKPerKey(keys.map(ColumnBridge.catalystExpression), orderExprs,
      k, rankAttr, df.queryExecution.analyzed)
    DatasetBridge.ofRows(spark, node)
  }

  /** Global (un-keyed) ranked top-k — `orderBy(order).limit(k)` plus a
    * 1-based rank column, in one operator: the grouping key is a constant
    * literal, so the partial exec prunes every map partition to <= k rows
    * and the ClusteredDistribution hashes those <= k x partitions partial
    * winners to ONE reducer whose k-sized heap emits the ranked result.
    * Replaces the `TakeOrderedAndProject` + single-partition
    * `row_number()` window pair the rank tails used to run — same rows
    * and ranks for a total `order` (callers append a tiebreaker), one
    * less sort, rank computed in the same pass as the merge. */
  def global(df: DataFrame, order: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame =
    perKey(df, Seq(org.apache.spark.sql.functions.lit(1)), order, k, rankCol)
}
