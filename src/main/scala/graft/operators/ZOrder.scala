package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two dimension keys so
  * that sorting by the combined value clusters rows that are close in
  * EITHER dimension — the standard lakehouse answer (Delta/Iceberg
  * `OPTIMIZE ZORDER`) to "the table is range-pruned by date today, but
  * half the queries filter on user".
  *
  * Why it matters at 100 TB: parquet row-group and file pruning work off
  * min/max statistics, and a single-column sort makes those statistics
  * tight for ONE column only — every other dimension's min/max spans the
  * whole range in every file, so nothing prunes. Z-ordering makes the
  * min/max envelope of a contiguous row block a small rectangle in
  * (x, y) space: predicates on either dimension skip most blocks
  * (ZOrderSpec measures exactly this block-overlap fraction).
  *
  * Everything is integer bit arithmetic — shifts and adds with plan-time
  * constant distances — so the z-value is whole-stage-codegen'd in Spark
  * and replayed verbatim by the SQL oracle.
  *
  * Contract: inputs must already be NON-NEGATIVE ints below 2^bits —
  * bucketize/rank-normalize first (the caller knows its key domains; a
  * modulo or `div` bucket is the usual move). bits <= 31 keeps the
  * interleaved value in a positive long.
  */
object ZOrder {

  /** Morton-interleave `x` (even bit positions) and `y` (odd): bit i of x
    * lands at 2i, bit i of y at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Sort the frame by the z-value of two prepared dimension columns and
    * write it — the at-rest layout move. `blockRows` maps to
    * parquet.block-size tuning in a real deployment; here it bounds rows
    * per output file so the min/max envelope per file is a small
    * (x, y) rectangle. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int = 16, blockRows: Int = 1 << 20): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.option("maxRecordsPerFile", blockRows.toLong)
      .mode("overwrite").parquet(path)

  /** Hilbert-curve index of (x, y) on the 2^order × 2^order grid — the
    * stronger locality sibling of [[zValue]] (Hilbert 1891; the xy→d
    * bit recursion as published in Warren, Hacker's Delight §16 / the
    * standard Wikipedia formulation): consecutive indices are ALWAYS
    * Manhattan-adjacent cells, where the Morton curve jumps across the
    * plane at every power-of-two boundary — so contiguous row blocks get
    * strictly tighter (x, y) min/max envelopes, which is the statistic
    * parquet pruning reads (HilbertSpec measures the envelope win vs
    * z-order on the same blocks).
    *
    * Shape: `order` chained projections, each pure integer bit arithmetic
    * (shift/and/xor/sub with plan-time constants) plus the conditional
    * quadrant rotation — whole-stage-codegen'd end to end, and replayed
    * verbatim by the SQL oracle as a CTE chain. Same contract as
    * [[zValue]]: inputs non-negative and below 2^order. The per-level
    * state (x, y rotate as the recursion descends) is why this is a
    * DataFrame transform rather than a single Column. Appends `out`. */
  def withHilbert(df: DataFrame, xCol: String, yCol: String, order: Int,
      out: String = "h"): DataFrame = {
    require(order >= 1 && order <= 30, s"order must be in [1, 30], got $order")
    val n = 1L << order
    var d = df.withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn(out, lit(0L))
    for (bit <- (order - 1) to 0 by -1) {
      val s = 1L << bit
      d = d
        .withColumn("__rx", shiftright(col("__hx"), bit).bitwiseAND(lit(1L)))
        .withColumn("__ry", shiftright(col("__hy"), bit).bitwiseAND(lit(1L)))
        .withColumn(out, col(out) +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hy"))
              .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hx"))
              .otherwise(col("__hx"))).otherwise(col("__hy")))
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
    }
    d.drop("__hx", "__hy", "__rx", "__ry", "__nx", "__ny")
  }

  /** [[writeZOrdered]] with the Hilbert key. */
  def writeHilbertOrdered(df: DataFrame, path: String, xCol: String,
      yCol: String, order: Int = 16, blockRows: Int = 1 << 20): Unit =
    withHilbert(df, xCol, yCol, order, "__h")
      .repartitionByRange(col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.option("maxRecordsPerFile", blockRows.toLong)
      .mode("overwrite").parquet(path)
}
