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

  /** Weight-of-Evidence / Information-Value binning report against a binary
    * label (Siddiqi §6 — the scorecard-era feature diagnostic PSI's chapter
    * follows): per bucket,
    *
    *   WOE = ln(p_pos / p_neg),   IV(feature) = Σ (p_pos − p_neg) · WOE,
    *
    * where p_pos / p_neg are the bucket's add-half-smoothed shares of the
    * feature's positive / negative mass. WOE tells a curation pipeline HOW
    * a feature bucket separates good from bad documents (the monotone
    * transform fed to scorecards); IV ranks features by total separation
    * (conventional read: < 0.02 useless, 0.1–0.3 medium, > 0.5 suspect).
    *
    * Same contracts as [[psiReport]]: pre-bucketed `(feature, bucket,
    * label)` observation rows (caller owns binning; label 0/1), add-half
    * smoothing keeps both shares positive, each ln rounds to 6 decimals
    * before the DECIMAL difference/product sums — bit-replayable by the
    * oracle under any partitioning. Scale shape: ONE word-count-shaped
    * exchange (the (feature, bucket) label counts); everything after is
    * bucket-sized. Output: (feature, bucket, n_pos, n_neg, woe, iv), iv
    * repeated per feature row — one frame at bucket grain. */
  def woeReport(obs: DataFrame): DataFrame = {
    val counts = obs.select(col("feature"), col("bucket"),
        col("label").cast("long").as("lab"))
      .groupBy("feature", "bucket")
      .agg(sum(col("lab")).as("n_pos"),
        sum(lit(1L) - col("lab")).as("n_neg"))
    val tot = counts.groupBy("feature").agg(
      sum("n_pos").as("tot_pos"), sum("n_neg").as("tot_neg"),
      count(lit(1)).as("n_buckets"))
    val j = counts.join(tot, "feature")
    def share(n: String, t: String) =
      (col(n).cast("double") + lit(0.5)) /
        (col(t).cast("double") + lit(0.5) * col("n_buckets").cast("double"))
    val pPos = share("n_pos", "tot_pos")
    val pNeg = share("n_neg", "tot_neg")
    val woe = (round(log(pPos), 6).cast("decimal(18,6)")
      - round(log(pNeg), 6).cast("decimal(18,6)"))
    val term = (round(pPos - pNeg, 6).cast("decimal(18,6)") * woe)
      .cast("decimal(38,12)")
    val buckets = j.select(col("feature"), col("bucket"),
      col("n_pos"), col("n_neg"),
      woe.cast("double").as("woe"), term.as("__term"))
    val iv = buckets.groupBy("feature")
      .agg(round(sum(col("__term")).cast("double"), 6).as("iv"))
    buckets.join(iv, "feature")
      .select(col("feature"), col("bucket"), col("n_pos"), col("n_neg"),
        col("woe"), col("iv"))
  }
}
