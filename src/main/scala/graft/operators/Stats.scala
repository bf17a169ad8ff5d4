package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group least-squares trend and correlation — the drift detector
  * ("is this source's quality declining over time", "is this sensor's
  * value trending") computed from sufficient statistics only.
  *
  * Everything reduces to five integer sums per group — n, Σx, Σy, Σxy,
  * Σx², Σy² — which partial-aggregate map-side and merge exactly (the
  * sketch-style collapse: the exchange carries six longs per group at any
  * corpus size, and per-batch sums merge by addition). The slope /
  * intercept / correlation formulas then run ONCE per group in doubles
  * with fixed parenthesization — deterministic on every engine because
  * the inputs are exact integers, unlike a built-in covar_samp/corr whose
  * float accumulators drift with partitioning.
  *
  * Integer domain contract: callers pre-scale x and y to integer units
  * (hours, cents) sized so each sum stays below 2^63 — the q84 pipeline
  * uses hours-since-epoch and value cents. Groups with fewer than 2 points
  * or zero x-variance are dropped (no slope exists).
  */
object Stats {

  /** Output: (group, n, slope, intercept, corr), slope/intercept in
    * y-units per x-unit, all rounded to 6 decimals. */
  def trendPerGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val s = df
      .select(col(groupCol).as("grp"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"))
    val dxx = n * sxx - sx * sx
    val dyy = n * syy - sy * sy
    val num = n * sxy - sx * sy
    s.filter(col("n") >= 2 && (n * sxx - sx * sx) =!= 0.0)
      .select(col("grp").as(groupCol), col("n"),
        round(num / dxx, 6).as("slope"),
        round((sy - (num / dxx) * sx) / n, 6).as("intercept"),
        when(dyy === 0.0, lit(0.0))
          .otherwise(round(num / sqrt(dxx * dyy), 6)).as("corr"))
  }
}
