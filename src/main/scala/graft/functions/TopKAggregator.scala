package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs per
  * group in a fixed-size buffer.
  *
  * This is the scale-correct alternative to `row_number().over(Window)` for
  * top-k: the window form sorts every candidate row within each partition key;
  * this aggregator carries at most k entries per group through partial
  * aggregation (map-side combine), so shuffle volume is k rows per group
  * instead of all rows. Same contract as the window form — used by
  * q44, which must hash-match q35's window-based oracle.
  */
private[functions] object TopK {
  /** Insert into an already-sorted (best-first) bounded buffer: binary-search
    * the insertion point after any equal elements (matching what a stable
    * re-sort of buf :+ in produced before), splice, cap at k. Replaces the
    * former O(k log k) full re-sort per accepted element. */
  def insertSorted[T](buf: Seq[T], in: T, k: Int, ord: Ordering[T]): Seq[T] = {
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(buf(mid), in) <= 0) lo = mid + 1 else hi = mid
    }
    val (pre, post) = buf.splitAt(lo)
    ((pre :+ in) ++ post).take(k)
  }
}

class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (score, id) => (-score, id) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  // buffer invariant: always sorted best-first, size <= k
  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted(ord).take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (k <= 0) buf
    else if (buf.size == k && ord.compare(in, buf.last) >= 0) buf // common case: O(1) reject
    else TopK.insertSorted(buf, in, k, ord) // O(log k) search + O(k) splice

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

/** Bounded top-k over arbitrary rows with a caller-supplied ordering — the
  * generalization of [[TopKAggregator]] for ranking keys that aren't a
  * (score, id) pair. Used by q51's vocabulary ranking, where the key is
  * (df desc, tf desc, token asc): the global `row_number()` window form sorts
  * EVERY distinct token on one partition, while this carries at most k rows
  * per partition through partial aggregation, so a web-scale vocabulary never
  * concentrates on a single task.
  */
class RowTopKAggregator[T: scala.reflect.runtime.universe.TypeTag](
    k: Int, ord: Ordering[T])
    extends Aggregator[T, Seq[T], Seq[T]] {

  override def zero: Seq[T] = Vector.empty

  // buffer invariant: always sorted best-first, size <= k
  private def trim(s: Seq[T]): Seq[T] = s.sorted(ord).take(k)

  override def reduce(buf: Seq[T], in: T): Seq[T] =
    if (k <= 0) buf
    else if (buf.size == k && ord.compare(in, buf.last) >= 0) buf // O(1) reject
    else TopK.insertSorted(buf, in, k, ord) // O(log k) search + O(k) splice

  override def merge(a: Seq[T], b: Seq[T]): Seq[T] = trim(a ++ b)

  override def finish(buf: Seq[T]): Seq[T] = buf

  override def bufferEncoder: Encoder[Seq[T]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[T]]()
  override def outputEncoder: Encoder[Seq[T]] = bufferEncoder
}
