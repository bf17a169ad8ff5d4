package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier, JASA 1958) — the
  * product-limit curve every churn/retention analysis reads: given one row
  * per subject with an observed duration and an event flag (1 = the event
  * happened — churn, failure; 0 = censored — still active at cutoff),
  * estimate S(t) = P(survive past t):
  *
  *   S(t_i) = Π_{j ≤ i} (1 − d_j / n_j)
  *
  * over the distinct EVENT times t_j, with d_j events at t_j and n_j
  * subjects still at risk (duration ≥ t_j). Censored subjects leave the
  * risk set without contributing an event — the estimator's whole point.
  *
  * Physical shape: subjects collapse to one (duration, n_subjects,
  * n_events) row per DISTINCT duration (hash aggregate, map-side combine
  * — the corpus-sized pass); the risk set is a running complement
  * n_j = N − (#subjects with shorter durations), and the product is a
  * cumulative sum of round-6 ln factors in DECIMAL (the q100 ln
  * convention) exponentiated once per output row — both windows run over
  * the distinct-duration table only (the q126 contract; recursive
  * bucketing is the escape hatch beyond ~10⁶ distinct durations). A
  * time where EVERY at-risk subject dies (d = n) sends the curve to an
  * exact 0 from then on (flagged, not ln(0)).
  *
  * Output, one row per distinct event time, ordered: (t, n_risk, n_events,
  * survival round-6). */
object Survival {

  def kaplanMeier(subjects: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val perDur = subjects.select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("long").as("ev"))
      .filter(col("t").isNotNull)
      .groupBy("t")
      .agg(count(lit(1)).as("cnt"), sum(col("ev")).as("d"))
    // global window, but DIMENSION-SIZED BY CONSTRUCTION: it runs over the
    // distinct-duration table (≤ the duration domain — hours/days since
    // entry — not the subject corpus), the one global window here that is
    // corpus-DERIVED rather than fixed; if distinct durations could reach
    // corpus size in a deployment (nanosecond-grain durations, no
    // pre-rounding), route through Stats.bucketedRanks' recursive
    // bucketing instead — the scaladoc's ~10⁶ escape hatch
    val w = Window.orderBy("t")
    val risked = perDur
      .withColumn("cumBefore",
        coalesce(sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .crossJoin(perDur.agg(sum("cnt").as("__n")))
      .withColumn("n_risk", col("__n") - col("cumBefore"))
    val events = risked.filter(col("d") > 0)
    val lf = when(col("d") < col("n_risk"),
      round(log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")), 6)
        .cast("decimal(18,6)")).otherwise(lit(0).cast("decimal(18,6)"))
    val we = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__lf", lf)
      .withColumn("__dead", max(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(we))
      .withColumn("__lsum", sum(col("__lf")).over(we))
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        when(col("__dead") === 1L, lit(0.0))
          .otherwise(round(exp(col("__lsum").cast("double")), 6)).as("survival"))
  }
}
