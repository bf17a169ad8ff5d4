package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality audits: the reference's sequence-gap detection and count
  * reconciliation (reference: wsprnet-scraper.sh:284-309, :271-274, :325-328).
  *
  * Scale design: the reference walks the sorted batch row by row. A naive Spark
  * translation is `lag(id) over (orderBy id)` — a single-partition global sort
  * that cannot scale. Instead we bucket ids by `id div bucketWidth` and
  * RECURSE: level 1 finds intra-bucket gaps via `lag` partitioned by bucket
  * (fully parallel); the per-bucket [min,max] summaries — n/bucketWidth rows —
  * go through the same construction, super-bucketed by
  * `bucket div bucketWidth`, until `levels` is exhausted and the residual
  * global window runs over n/bucketWidth^(levels-1) rows. Results are
  * identical to the global walk for any bucketWidth and level count; pick
  * `levels` so width^levels covers the id space (the default 2^20-wide,
  * 2-level shape handles 2^40 ids with a ≤2^20-row top window; a 10^13-id
  * space wants levels=3, where no window anywhere exceeds 2^20 rows).
  */
object Audit {

  /** Gaps between consecutive non-overlapping [lo, hi] ranges ordered by
    * `key`: recursion level > 1 partitions the lag window by the next-level
    * bucket and feeds the per-bucket range summaries back through itself;
    * level 1 is the residual global window. min(lo)/max(hi) ARE the
    * boundary ranges because keys order the ranges and they never overlap. */
  private def rangeGaps(ranges: DataFrame, width: Long, levels: Int): DataFrame =
    if (levels <= 1) {
      val w = Window.orderBy("key") // residual rows only — see scaladoc
      ranges.withColumn("prevhi", lag("hi", 1).over(w))
        .filter(col("lo") - col("prevhi") > 1)
        .select(col("prevhi").as("gap_after"), col("lo").as("next_present"),
          (col("lo") - col("prevhi") - 1).as("missing"))
    } else {
      // integer `div`, not `/`: double division would corrupt bucket ids
      // beyond 2^53 — real at 100 TB sequence scales
      val bucketed = ranges.withColumn("bkt", expr(s"key div ${width}L"))
      val wIntra = Window.partitionBy("bkt").orderBy("key")
      val intra = bucketed
        .withColumn("prevhi", lag("hi", 1).over(wIntra))
        .filter(col("lo") - col("prevhi") > 1)
        .select(col("prevhi").as("gap_after"), col("lo").as("next_present"),
          (col("lo") - col("prevhi") - 1).as("missing"))
      val summary = bucketed.groupBy("bkt")
        .agg(min("lo").as("lo"), max("hi").as("hi"))
        .select(col("bkt").as("key"), col("lo"), col("hi"))
      intra.unionByName(rangeGaps(summary, width, levels - 1))
    }

  /** One row per gap: (gap_after, next_present, missing) where `missing` ids in
    * (gap_after, next_present) are absent. Input ids must be distinct and >= 0. */
  def gapDetails(df: DataFrame, idCol: String, bucketWidth: Long = 1L << 20,
      levels: Int = 2): DataFrame = {
    require(levels >= 1, s"levels must be >= 1: $levels")
    val ranges = df.select(col(idCol).cast("long").as("key"))
      .select(col("key"), col("key").as("lo"), col("key").as("hi"))
    rangeGaps(ranges, bucketWidth, levels)
  }

  /** Totals matching the reference's audit log line (wsprnet-scraper.sh:302-309):
    * number of gaps, total missing ids, and the largest single gap. */
  def gapAudit(df: DataFrame, idCol: String, bucketWidth: Long = 1L << 20,
      levels: Int = 2): DataFrame =
    gapDetails(df, idCol, bucketWidth, levels).agg(
      count(lit(1)).as("total_gaps"),
      coalesce(sum("missing"), lit(0L)).as("total_missing"),
      coalesce(max("missing"), lit(0L)).as("max_gap"))

  /** Stage-count reconciliation (A4): one row of per-stage counts. */
  def reconcile(stages: Seq[(String, DataFrame)]): DataFrame = {
    val counted = stages.map { case (name, df) =>
      df.agg(count(lit(1)).as(name))
    }
    counted.reduce(_.crossJoin(_))
  }
}
