package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality audits: the reference's sequence-gap detection and count
  * reconciliation (reference: wsprnet-scraper.sh:284-309, :271-274, :325-328).
  *
  * Scale design: the reference walks the sorted batch row by row. A naive Spark
  * translation is `lag(id) over (orderBy id)` — a single-partition global sort
  * that cannot scale. Instead we bucket ids by `id div bucketWidth`:
  *   1. intra-bucket gaps via `lag` partitioned by bucket (fully parallel);
  *   2. inter-bucket gaps via `lag` over the per-bucket min/max aggregates —
  *      a window over ~n/bucketWidth rows, not n rows.
  * Results are identical to the global walk for any bucketWidth.
  */
object Audit {

  /** One row per gap: (gap_after, next_present, missing) where `missing` ids in
    * (gap_after, next_present) are absent. Input ids must be distinct and >= 0. */
  def gapDetails(df: DataFrame, idCol: String, bucketWidth: Long = 1L << 20): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("id"))
      // integer `div`, not `/`: double division would corrupt bucket ids
      // beyond 2^53 — real at 100 TB sequence scales
      .withColumn("bucket", expr(s"id div ${bucketWidth}L"))
    val wIntra = Window.partitionBy("bucket").orderBy("id")
    val intra = ids
      .withColumn("prev", lag("id", 1).over(wIntra))
      .filter(col("id") - col("prev") > 1)
      .select(col("prev").as("gap_after"), col("id").as("next_present"),
        (col("id") - col("prev") - 1).as("missing"))
    val perBucket = ids.groupBy("bucket")
      .agg(min("id").as("bmin"), max("id").as("bmax"))
    val wBuckets = Window.orderBy("bucket") // ~n/bucketWidth rows only
    val inter = perBucket
      .withColumn("prevmax", lag("bmax", 1).over(wBuckets))
      .filter(col("bmin") - col("prevmax") > 1)
      .select(col("prevmax").as("gap_after"), col("bmin").as("next_present"),
        (col("bmin") - col("prevmax") - 1).as("missing"))
    intra.unionByName(inter)
  }

  /** Totals matching the reference's audit log line (wsprnet-scraper.sh:302-309):
    * number of gaps, total missing ids, and the largest single gap. */
  def gapAudit(df: DataFrame, idCol: String, bucketWidth: Long = 1L << 20): DataFrame =
    gapDetails(df, idCol, bucketWidth).agg(
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
