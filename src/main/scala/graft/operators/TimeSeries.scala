package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series conditioning: resample irregular observations onto a
  * fixed bucket grid, gap-fill by forward fill, and flag anomalies with a
  * trailing-window z-score — the metric-drift / sensor-QA shape (and, in a
  * training-data pipeline, the per-source ingest-volume watchdog that
  * catches a crawler going dark or a duplicate flood before it poisons a
  * mixture).
  *
  * Portability: the bucket value is `max(struct(ts, value))` (latest
  * observation wins, value breaks exact-ts ties — the q80 CDC convention,
  * replayable as a row_number window); rolling moments are sums of
  * DECIMAL(18,6)-cast values (exact, order-independent), collapsed to a
  * double by ONE fixed-parenthesization formula; the z-score is rounded to
  * 6 decimals (the q100 round-6 convention).
  *
  * Scale shape: resampling is a (key, bucket) hash aggregate — partial-
  * combines map-side, exchange carries one row per occupied bucket. The
  * grid explode generates `sequence(min_bucket, max_bucket)` per key —
  * output-sized, narrow. Fill and z-score are windows over the SAME
  * (key, bucket) sort, so Catalyst plans them over one exchange + one
  * sort; per-key frames spill, hot keys are a sort problem, not a heap
  * problem. Nothing here is corpus-quadratic; the only corpus-wide state
  * is the (key, bucket) grid itself. */
object TimeSeries {

  /** Resample onto a `bucketNs` grid and forward-fill gaps per key.
    * `tsCol` is integer nanoseconds (the fixture contract). Output:
    * keyCols ++ (bucket, v, n_obs) — one row per key per grid bucket from
    * the key's first to last observation; `v` = latest observed value in
    * or before the bucket, `n_obs` = observations landing in the bucket. */
  def resampleFFill(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, bucketNs: Long): DataFrame = {
    require(keyCols.nonEmpty, "resampleFFill needs key columns")
    require(bucketNs > 0, "bucketNs must be positive")
    val key = keyCols.map(col)
    val obs = df
      // integer division: ts is ~1.7e18 ns, past double's 2^53 exactness
      .withColumn("bucket", expr(s"`$tsCol` div ${bucketNs}L"))
      .groupBy(key :+ col("bucket"): _*)
      .agg(max(struct(col(tsCol), col(valueCol))).getField(valueCol).as("v_obs"),
        count(lit(1)).as("n_obs"))
    val grid = obs.groupBy(key: _*)
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(key :+ explode(sequence(col("b0"), col("b1"))).as("bucket"): _*)
    val w = Window.partitionBy(key: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, keyCols :+ "bucket", "left")
      .select(key ++ Seq(col("bucket"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs")): _*)
  }

  /** Trailing-window z-score per key over an already-gridded series:
    * z = (v - mean) / stddev of the PREVIOUS `window` rows (the current
    * row judged against its history, never against itself). Emitted only
    * once the history frame is full and non-flat; rounded to 6 decimals.
    * Adds (z, anomaly) — anomaly = |z| > `threshold`. */
  def rollingAnomaly(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, window: Int, threshold: Double = 3.0): DataFrame = {
    require(window >= 2, "rollingAnomaly needs a window of at least 2")
    val d = col(valueCol).cast("decimal(18,6)")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-window, -1)
    val s1 = sum(d).over(w)
    val s2 = sum(d * d).over(w)
    val n = count(d).over(w)
    // ONE fixed parenthesization, replayed verbatim by the oracle
    val m: Column = s1.cast("double") / n.cast("double")
    val msq: Column = s2.cast("double") / n.cast("double")
    val variance: Column = msq - m * m
    // variance gate at 1e-6, not 0: a numerically-flat history (variance
    // from float residue alone) would give astronomical z whose 6-decimal
    // rounding exceeds double ulp — below the gate there is no signal to
    // score. The gate compares identically on any IEEE engine.
    val z = when(n === window && variance > 1e-6,
      round((col(valueCol) - m) / sqrt(variance), 6))
    df.withColumn("z", z)
      .withColumn("anomaly", when(col("z").isNotNull, abs(col("z")) > threshold))
  }
}
