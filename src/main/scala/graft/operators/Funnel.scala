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

  /** Top-k frequent event paths: sliding n-grams over each user's
    * time-ordered event-type sequence ("view>click>purchase"), counted
    * corpus-wide — the journey-mining rollup behind Sankey views and
    * funnel DISCOVERY (which funnels exist, before picking one to measure
    * with [[funnelSteps]]).
    *
    * Per-user `lead` windows build the n-grams (per-key, never global;
    * ties sequence by (ts, id) — the [[markovTransitions]] order), one
    * word-count-shaped aggregate counts paths, and the global top-k runs
    * through the bounded-heap execs ([[graft.plans.TopK.global]]: map-side
    * <= k prune, one k-sized reducer heap) ordered (count desc, path
    * asc) — no sort at any width. */
  def pathNgrams(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, n: Int = 3, k: Int = 10): DataFrame = {
    require(n >= 2 && n <= 5 && k >= 1, "n in [2,5], k >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol).asc, col(idCol).asc)
    val base = events.select(col(userCol), col(typeCol).cast("string").as("t0"),
      col(tsCol), col(idCol))
    val withLeads = (1 until n).foldLeft(base) { (df, o) =>
      df.withColumn(s"t$o", lead(col("t0"), o).over(w))
    }
    val full = (1 until n).map(o => col(s"t$o").isNotNull).reduce(_ && _)
    val counts = withLeads.filter(full)
      .select(concat_ws(">", (0 until n).map(o => col(s"t$o")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
    graft.plans.TopK.global(counts, Seq(col("n").desc, col("path").asc), k)
      .select("path", "n")
  }

  /** Retention half-life: fold [[retentionCohorts]] across cohorts into a
    * per-offset active-user curve, fit ln(share) = a + b·offset by least
    * squares over the ≤ #offsets aggregate rows, and report the implied
    * half-life −ln 2 / b — the one-number summary a growth team tracks.
    *
    * Exactness: per-offset user counts are exact integers; each ln(share)
    * rounds to 6 (the libm rule) and the OLS runs over the bounded
    * offset table with DECIMAL sums of round-6 terms, so slope/half-life
    * replay bit-for-bit. Offsets beyond `maxOffset` are dropped (the
    * right-censored tail where few cohorts have had a chance to age).
    * Output: one row (n_offsets, slope, intercept, half_life_buckets);
    * empty if the curve doesn't decay (slope ≥ 0 after rounding). */
  def retentionHalfLife(events: DataFrame, userCol: String, tsCol: String,
      bucketSize: Long, maxOffset: Int = 10): DataFrame = {
    val cohorts = retentionCohorts(events, userCol, tsCol, bucketSize)
    val perOffset = cohorts.filter(col("offset") <= maxOffset)
      .groupBy("offset").agg(sum(col("n_users")).as("active"))
    val base = perOffset.filter(col("offset") === 0)
      .select(col("active").as("base"))
    val pts = perOffset.crossJoin(base)
      .withColumn("y", round(log(col("active").cast("double") /
        col("base").cast("double")), 6).cast("decimal(18,6)"))
      .withColumn("x", col("offset").cast("decimal(10,0)"))
    val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nd = col("n").cast("double")
    val (sx, sy, sxy, sxx) = (col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"))
    val dxx = nd * sxx - sx * sx
    val slope = (nd * sxy - sx * sy) / dxx
    m.filter(col("n") >= 2 && round(dxx, 9) =!= 0.0)
      .select(col("n").as("n_offsets"),
        round(slope, 6).as("slope"),
        round((sy - slope * sx) / nd, 6).as("intercept"),
        round(-log(lit(2.0)) / slope, 6).as("half_life_buckets"))
      .filter(col("slope") < 0.0)
  }

  /** Conversion-latency report: per user, the delay from the FIRST
    * `fromType` event to the first `toType` event after it, summarized as
    * exact percentiles plus the conversion rate — "how long does signup →
    * purchase take, and for what share of signups does it happen at all".
    *
    * Scale shape: two per-user conditional-min aggregates joined on the
    * user key (user-sized frames, the funnel discipline); the latency
    * percentiles route through [[Stats.exactQuantiles]]' bucket-refinement
    * selection — no global sort, ≤ buckets rows of driver state. Delays
    * quantize to whole hours by integer floor-division of the nanosecond
    * timestamps (exact at epoch magnitude). Output: one row per requested
    * percentile — (p, rank, hours, n_start, n_converted, cvr), cvr
    * round-6. */
  def timeToConvert(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, fromType: String, toType: String,
      ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val starts = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("unit")).agg(min(col(tsCol)).as("t0"))
    val convs = events.filter(col(typeCol) === toType)
      .select(col(userCol).as("unit"), col(tsCol).as("t1"))
      .join(starts, "unit")
      .filter(col("t1") > col("t0"))
      .groupBy("unit").agg(min(col("t1") - col("t0")).as("dt"))
      .select(col("unit"), expr("dt div 3600000000000").as("hours"))
    val counts = starts.agg(count(lit(1)).as("n_start"))
      .crossJoin(convs.agg(count(lit(1)).as("n_converted")))
    Stats.exactQuantiles(convs, "hours", ps)
      .crossJoin(counts)
      .select(col("p"), col("rank"), col("value").as("hours"),
        col("n_start"), col("n_converted"),
        round(col("n_converted").cast("double") /
          col("n_start").cast("double"), 6).as("cvr"))
  }

  /** First-order Markov transition matrix over each user's time-ordered
    * event stream — "after a `view`, what happens next and how often" —
    * the model behind next-action prediction, removal-effect attribution,
    * and journey Sankey diagrams.
    *
    * Per-user `lead` window pairs each event with its successor (per-key
    * window: partitions by user, never global), the terminal event pairs
    * with the absorbing state `"(end)"`, then one word-count-shaped
    * aggregate counts (from, to) pairs — ≤ |types+1|² rows after the
    *  map-side combine. Probabilities row-normalize on that bounded table.
    *
    * Tie order within a user is (ts, event_id) so simultaneous events
    * sequence deterministically on every engine. Output: (from_state,
    * to_state, n, p) with p = round(n / Σ_to n, 6), ordered for display. */
  def markovTransitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .select(col(userCol), col(typeCol).cast("string").as("from_state"),
        col(tsCol), col(idCol))
      .withColumn("to_state",
        coalesce(lead(col("from_state"), 1).over(w), lit("(end)")))
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val rowTot = counts.groupBy("from_state").agg(sum(col("n")).as("tot"))
    counts.join(rowTot, "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6).as("p"))
  }
}
