package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Shared per-partition bounded top-k fold: key → a size-capped binary
  * heap of COPIED rows, worst row at the root so each new row compares
  * against the current k-th best in O(1) and replaces it in O(log k).
  * State is keys-per-partition × k rows — the bounded-aggregation-state
  * contract ([[graft.functions.RowTopKAggregator]]'s argument), never a
  * partition sort. */
private[plans] object TopKFold {
  def fold(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
      ord: Ordering[InternalRow], k: Int)
      : scala.collection.mutable.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val heaps = scala.collection.mutable
      .LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
    val worstFirst = ord.reverse
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case None =>
          val h = new java.util.PriorityQueue[InternalRow](k, worstFirst)
          h.add(row.copy())
          heaps.put(key.copy(), h)
        case Some(h) =>
          if (h.size < k) h.add(row.copy())
          else if (ord.lt(row, h.peek())) { h.poll(); h.add(row.copy()) }
      }
    }
    heaps
  }
}

/** Map-side prune of [[TopKPerKey]]: emit at most k rows per key per
  * INPUT partition (unranked, any order) — the partial-aggregation
  * analogue for top-k, so the exchange the final exec requires moves
  * <= keys × k rows per map partition instead of the corpus. */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, out, kk) = (keys, order, child.output, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(ks, out)
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(os, out)
      TopKFold.fold(iter, keyProj, ord, kk).valuesIterator.flatMap { h =>
        val buf = new Array[InternalRow](h.size)
        var i = 0
        while (!h.isEmpty) { buf(i) = h.poll(); i += 1 }
        buf.iterator
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce side of [[TopKPerKey]]: requires clustering on the keys (Spark
  * inserts the hash exchange), re-folds the <= k-per-key-per-map partials
  * into the true per-key top k, then emits each key's rows best-first
  * with the 1-based rank appended — `row_number() <= k` semantics with a
  * k-sized heap where WindowExec sorts whole partitions. */
case class TopKPerKeyFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, childOut, outAttrs, kk) = (keys, order, child.output, output, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(ks, childOut)
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(os, childOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      TopKFold.fold(iter, keyProj, ord, kk).valuesIterator.flatMap { h =>
        // heap drains worst-first; reverse into best-first rank order
        val buf = new Array[InternalRow](h.size)
        var i = h.size - 1
        while (!h.isEmpty) { buf(i) = h.poll(); i -= 1 }
        buf.iterator.zipWithIndex.map { case (row, idx) =>
          rankRow.setInt(0, idx + 1)
          outProj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = false)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Planner strategy for [[TopKPerKey]]: partial prune below the exchange,
  * ranked final above it (the two-phase aggregate shape). Installed by
  * [[graft.functions.expressions.GraftExtensions]] alongside
  * [[TopKWindowRewrite]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      TopKPerKeyFinalExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
