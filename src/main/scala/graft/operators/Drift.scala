package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift report between two loads of a corpus: the
  * Population Stability Index per feature,
  *
  *   PSI(feature) = Σ_buckets (p_new − p_old) · ln(p_new / p_old),
  *
  * the standard ML-ops drift score (Siddiqi, "Credit Risk Scorecards",
  * 2006 §8; the symmetrized form of the Jeffreys divergence over the
  * bucketed marginals). Run between yesterday's and today's corpus
  * snapshot — or the reference training mix and a candidate refresh — to
  * flag which features moved before a model retrain ingests them. The
  * conventional read: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Inputs are PRE-BUCKETED observation rows `(feature, bucket)` — one row
  * per observation, any number of features stacked in one frame (the
  * caller owns binning policy: categorical values pass through, numerics
  * get a floor-division bin, q115 shows both). Buckets absent on one side
  * are Laplace-smoothed (+0.5 per bucket over the UNION of buckets, the
  * add-half rule) so the log is always finite and the score still reflects
  * appeared/vanished buckets instead of dropping them.
  *
  * Portability (the q100 convention): each ln is rounded to 6 decimals and
  * cast to DECIMAL(38,6), the per-feature sum runs over
  * DECIMAL(38,12) products — reduction-order-independent across any
  * partitioning, and replayable bit-for-bit by the SQL oracle; ln itself
  * is the one ~1-ulp libm wobble, negligible after the round (scaladoc'd
  * in Selection the same way).
  *
  * Scale shape: ONE corpus-sized exchange per side — the (feature,
  * bucket) count, which partial-aggregates map-side (word-count-shaped).
  * Everything after (totals, bucket union, smoothing, the PSI sum) runs
  * on bucket-sized frames. Nothing bucket-shaped re-touches the corpus.
  */
object Drift {

  /** PSI per feature between `oldObs` and `newObs` (both `(feature,
    * bucket)` observation rows, bucket any orderable type rendered
    * to string by the caller).
    * Output: (feature, n_buckets, n_old, n_new, psi) — psi rounded to 6
    * decimals, n_* the observation counts entering the marginals. */
  def psiReport(oldObs: DataFrame, newObs: DataFrame): DataFrame = {
    def counts(df: DataFrame, side: String): DataFrame =
      df.select(col("feature"), col("bucket"))
        .groupBy("feature", "bucket").agg(count(lit(1)).as(s"n_$side"))
    val merged = counts(oldObs, "old")
      .join(counts(newObs, "new"), Seq("feature", "bucket"), "full_outer")
      .select(col("feature"), col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    // per-feature totals and bucket counts: bucket-sized aggregates
    val tot = merged.groupBy("feature").agg(
      sum("n_old").as("tot_old"), sum("n_new").as("tot_new"),
      count(lit(1)).as("n_buckets"))
    val j = merged.join(tot, "feature")
    // add-half smoothing over the UNION bucket set keeps both shares
    // strictly positive; shares are plain doubles — only the ln is rounded
    def share(n: String, t: String) =
      (col(n).cast("double") + lit(0.5)) /
        (col(t).cast("double") + lit(0.5) * col("n_buckets").cast("double"))
    val pOld = share("n_old", "tot_old")
    val pNew = share("n_new", "tot_new")
    // DECIMAL(18,6) factors: wide enough for any share/ln magnitude, and
    // the product stays inside width 38 so BOTH engines keep it decimal
    // (a 38-wide multiplicand would overflow DuckDB's decimal multiply)
    val lnDiff = (round(log(pNew), 6).cast("decimal(18,6)")
      - round(log(pOld), 6).cast("decimal(18,6)"))
    val pDiff = round(pNew - pOld, 6).cast("decimal(18,6)")
    j.withColumn("__term", (pDiff * lnDiff).cast("decimal(38,12)"))
      .groupBy("feature")
      .agg(max("n_buckets").as("n_buckets"), max("tot_old").as("n_old"),
        max("tot_new").as("n_new"),
        round(sum(col("__term")).cast("double"), 6).as("psi"))
  }
}
