package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, type, time) stream: strictly
  * ordered funnel conversion and cohort retention — the two standard
  * product-analytics rollups, expressed as pure aggregate plans.
  *
  * Scale shape (funnel): step k is a per-user conditional-min aggregate
  * joined to step k-1's per-user timestamps — k-1 equi-joins on the user
  * key, every frame USER-sized (never event-sized) after its aggregate,
  * and each aggregate partial-combines map-side. The alternative
  * single-pass form (collect each user's events into an array and fold)
  * is one shuffle but holds a user's whole history on one task — a hot
  * user becomes a heap problem. The chained-aggregate form keeps hot
  * users as ordinary skewed aggregate keys that combine away map-side,
  * which is the 100 TB-safe trade.
  *
  * Scale shape (retention): two aggregates — first-seen bucket per user,
  * then distinct (user, bucket) activity joined against it — both keyed
  * on the user, so the second join is co-partitioned with the first
  * aggregate's output. Nothing wider than (users × active buckets) ever
  * reaches an exchange.
  */
object Funnel {

  /** Users reaching each step of a strictly ordered funnel. A user
    * reaches step k if they have a `typeCol == steps(k)` event with
    * `tsCol` STRICTLY after the earliest time at which they reached step
    * k-1 (earliest-valid-completion semantics: each step's anchor is the
    * min qualifying timestamp, which makes downstream reach maximal and
    * the result deterministic). `tsCol` must be numeric/orderable.
    *
    * Output: (step, step_name, n_users), one row per step.
    */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val perStep = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val mine = events.filter(col(typeCol) === step)
        val reached = prev match {
          case None => mine
          case Some(p) =>
            mine.join(p.select(col(userCol), col("__t").as("__pt")), Seq(userCol))
              .filter(col(tsCol) > col("__pt"))
        }
        Some(reached.groupBy(userCol).agg(min(tsCol).as("__t")))
    }.flatten
    perStep.zip(steps).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(name).as("step_name"), col("n_users"))
    }.reduce(_.union(_))
  }

  /** Cohort retention: bucket time into `bucketSize` units of `tsCol`
    * (e.g. days given nanosecond timestamps and 86400e9), cohort each
    * user by their first active bucket, and count distinct active users
    * per (cohort, bucket offset).
    *
    * Output: (cohort, offset, n_users) — the retention triangle.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    // integer floor-div: `/` on Columns is IEEE double division, which is
    // not even exact at nanosecond-epoch magnitudes (> 2^53)
    val bucketed = events.select(col(userCol),
      expr(s"`$tsCol` div ${bucketSize}L").as("__b"))
    val cohorts = bucketed.groupBy(userCol).agg(min("__b").as("cohort"))
    bucketed.distinct()
      .join(cohorts, Seq(userCol))
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
