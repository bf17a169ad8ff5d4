package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point to every interval containing it,
  * bounds inclusive — the temporal-correlation primitive (events within
  * maintenance windows, spots within propagation openings, log lines within
  * incident spans) that plain SQL expresses as a non-equi `BETWEEN` join.
  *
  * Spark's optimizer has no range-join strategy: a raw
  * `p.t BETWEEN i.lo AND i.hi` predicate plans as BroadcastNestedLoopJoin —
  * O(points × intervals) comparisons and a broadcast of one whole side,
  * which dies at any real scale. This operator rewrites the range predicate
  * as an EQUI join on a bucketized domain so Catalyst plans an ordinary
  * hash/sort-merge join:
  *
  *   - each point lands in exactly ONE bucket: floor(t / W)
  *   - each interval explodes to the buckets it overlaps:
  *     sequence(floor(lo/W), floor(hi/W))
  *   - equi-join on bucket, then the exact `BETWEEN` filter
  *
  * A (point, interval) match is found exactly once — the point's single
  * bucket is necessarily among the interval's buckets — so no dedup pass is
  * needed.
  *
  * Scale shape: ONE shuffle of each side on the bucket key (or none for the
  * exploded-interval side when it broadcasts). The interval side grows by
  * its expansion factor avg(len/W + 1) — `bucketWidth` is the knob, set it
  * near the median interval length so expansion stays a small constant
  * (expansion 2x at W = len; 1 + len/W generally). Point-heavy workloads
  * keep the big side un-expanded by construction. Bucket skew (a hot hour)
  * is ordinary equi-join skew — AQE's skew-join split applies, unlike a
  * nested-loop plan which cannot be split. At rest, partitioning the point
  * table by bucket makes the join co-located.
  */
object RangeJoin {

  /** Join `points` to `intervals` where
    * `points(pointCol) ∈ [intervals(startCol), intervals(endCol)]`
    * (inclusive both ends). All three columns must be integral (long);
    * intervals with end < start match nothing and are dropped up front.
    * Negative domains are safe: `div` truncates toward zero, which is
    * monotone, so lo <= t <= hi always puts t's bucket inside the
    * interval's bucket range — the exact filter then removes any
    * over-match from the unevenly-sized buckets around zero.
    * Output: matched rows with all columns of both inputs (bucket key
    * removed); column names must not collide across the two inputs. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pb = points.withColumn("__bucket", expr(s"$pointCol div ${bucketWidth}L"))
    val ib = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket", explode(sequence(
        expr(s"$startCol div ${bucketWidth}L"), expr(s"$endCol div ${bucketWidth}L"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
