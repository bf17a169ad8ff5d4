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

  /** Seasonal-baseline anomaly flags: score each observation against the
    * mean ± 3σ of ITS OWN seasonal slot (key × hour-of-day here) instead
    * of a global band — the fix for metrics with a daily rhythm, where a
    * global z-score calls every peak hour an anomaly and misses a quiet-
    * hour spike ([[rollingAnomaly]]'s trailing window is the
    * trend-following complement; this is the calendar-following one).
    *
    * One word-count-shaped aggregate builds the (key, slot) baseline
    * table — n, Σv, Σv² as DECIMAL(18,6) sums, mean/σ by ONE fixed double
    * formula each — which broadcasts back onto the stream; flagging is a
    * narrow filter. Slots with n < minN never flag (no baseline). Output:
    * the flagged rows (idCol, key, hod, v, mean, sd, z), z round-6. */
  def seasonalAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, threshold: Double = 3.0,
      minN: Int = 5): DataFrame = {
    val rows = df
      .filter(col(valueCol).isNotNull)
      .select(col(idCol), col(keyCol).cast("string").as("key"),
        expr(s"(`$tsCol` div 3600000000000) % 24").as("hod"),
        col(valueCol).cast("double").as("v"))
    val base = rows.groupBy("key", "hod")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).as("sv"),
        sum(col("v").cast("decimal(18,6)") * col("v").cast("decimal(18,6)"))
          .as("svv"))
      .filter(col("n") >= minN)
      .select(col("key"), col("hod"), col("n"),
        (col("sv").cast("double") / col("n").cast("double")).as("m"),
        sqrt((col("svv").cast("double") - col("sv").cast("double")
          * col("sv").cast("double") / col("n").cast("double"))
          / (col("n").cast("double") - lit(1.0))).as("sd"))
    rows.join(broadcast(base), Seq("key", "hod"))
      .filter(col("sd") > 1e-9 &&
        abs(col("v") - col("m")) > lit(threshold) * col("sd"))
      .select(col(idCol), col("key"), col("hod"), col("v"),
        round(col("m"), 6).as("mean"), round(col("sd"), 6).as("sd"),
        round((col("v") - col("m")) / col("sd"), 6).as("z"))
  }

  /** Incremental maintenance for [[decayedTopK]]'s score table — the
    * streaming-sketch pattern (the DocIngest/rankInsert shape) applied to
    * the decayed leaderboard: exponential decay is the ONE window shape
    * that folds exactly, because aging a sum is one multiplication —
    *   Σᵢ 2^−(a_i+Δ)/h  =  2^−Δ/h · Σᵢ 2^−a_i/h
    * so a daemon keeps (group, item, score, asof) state and folds each
    * micro-batch in O(state + batch) instead of rescanning history.
    *
    * Arithmetic contract: scores are DECIMAL(38,6) sums of round-6
    * weights, and the aging factor is round-6 — so fold-vs-one-shot
    * equality is EXACT whenever the decay exponents stay ≤ 6 half-lives
    * (2^−k has ≤ 6 decimals for k ≤ 6; spec-pinned on aligned fixtures)
    * and agrees to ~1e-6 per item beyond that (each item's score is one
    * rounded product per fold). Items decayed below `floorScore` are
    * dropped — the state-size bound that keeps a forever-running daemon's
    * table at "recently active items" size.
    *
    * Scale shape: one aggregate over the batch, one narrow multiply over
    * state, one co-partitioned union-aggregate on (group, item). The
    * 1-row asOf frames cross-join in as plan literals. */
  def decayFold(state: DataFrame, batch: DataFrame, groupCol: String,
      itemCol: String, tsCol: String, halfLifeHours: Long,
      floorScore: Double = 1e-6): DataFrame = {
    require(halfLifeHours > 0, "halfLifeHours must be positive")
    val newAsOf = batch.agg(max(col(tsCol)).as("__bmax"))
      .crossJoin(state.agg(coalesce(max(col("asof")), lit(0L)).as("__smax")))
      .select(greatest(col("__bmax"), col("__smax")).as("__asof"))
    val batchScores = batch
      .select(col(groupCol).cast("string").as("g"),
        col(itemCol).cast("long").as("item"), col(tsCol).cast("long").as("tsn"))
      .crossJoin(newAsOf)
      .withColumn("age_h", expr("(__asof - tsn) div 3600000000000"))
      .withColumn("wt", round(pow(lit(0.5),
        col("age_h").cast("double") / lit(halfLifeHours.toDouble)), 6)
        .cast("decimal(38,6)"))
      .groupBy("g", "item").agg(sum(col("wt")).as("sc"))
    val aged = state.crossJoin(newAsOf)
      .withColumn("age_h", expr("(__asof - asof) div 3600000000000"))
      .withColumn("factor", round(pow(lit(0.5),
        col("age_h").cast("double") / lit(halfLifeHours.toDouble)), 6))
      .select(col(groupCol).cast("string").as("g"),
        col(itemCol).cast("long").as("item"),
        round(col("score").cast("double") * col("factor"), 6)
          .cast("decimal(38,6)").as("sc"))
    batchScores.unionByName(aged)
      .groupBy("g", "item").agg(sum(col("sc")).as("score"))
      .filter(col("score").cast("double") >= floorScore)
      .crossJoin(newAsOf)
      .select(col("g").as(groupCol), col("item").as(itemCol),
        col("score"), col("__asof").as("asof"))
  }

  /** CUSUM changepoint detection per key (Page, Biometrika 1954; the
    * Taylor change-in-mean formulation): locate the split point where the
    * cumulative deviation from the series mean peaks — the level-shift
    * detector that catches "this source's quality metric stepped down on
    * the 12th" where [[rollingAnomaly]] (spikes) and [[seasonalAnomaly]]
    * (rhythm) stay silent.
    *
    * Arithmetic contract: with per-key totals n and T = Σv and prefix
    * sums S_k (DECIMAL sums of DECIMAL(18,6) values over the TOTAL order
    * (ts, id)), the deviation is D_k = |n·S_k − k·T| — the mean-centered
    * CUSUM scaled by n, kept INTEGER-exact in DECIMAL(38,6) so the argmax
    * has no float tie ambiguity. The changepoint is the EARLIEST ts
    * attaining max D_k (a flat series has all D_k = 0 → cp = first ts,
    * shift 0). Reported cusum = round(maxD/n, 6) = max_k |S_k − k·mean|;
    * mean_before/after/shift are fixed-formula round-6 doubles.
    *
    * Scale shape: per-key windows over one (key)-partitioned sort (the
    * sessionize stance — a hot key is a sort/spill problem, not a heap
    * one), then key-sized aggregates and joins. Nothing corpus-quadratic.
    * Output: (key, n, cp_ts, cusum, mean_before, mean_after, shift). */
  def changepoint(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("long").as("tsn"), col(idCol).cast("long").as("rid"),
        col(valueCol).cast("decimal(18,6)").as("v"))
    val wOrd = Window.partitionBy("key").orderBy(col("tsn"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("key")
    val cum = rows
      .withColumn("k", row_number().over(
        Window.partitionBy("key").orderBy(col("tsn"), col("rid"))).cast("long"))
      .withColumn("s", sum(col("v")).over(wOrd).cast("decimal(24,6)"))
      .withColumn("n", count(lit(1)).over(wAll))
      // DECIMAL(12,0)·DECIMAL(24,6) stays under the 38-digit cap in BOTH
      // engines (DuckDB widens a raw BIGINT to DECIMAL(19,0) and refuses
      // the 43-digit product type)
      .withColumn("t", sum(col("v")).over(wAll).cast("decimal(24,6)"))
      .withColumn("d", abs((col("n").cast("decimal(12,0)") * col("s")
        - col("k").cast("decimal(12,0)") * col("t")).cast("decimal(38,6)")))
    graft.util.Checkpoints.ensureDir(df.sparkSession)
    val peak = cum.groupBy("key").agg(max(col("d")).as("maxd"))
    // peak/cp are key-sized; broadcast them into the corpus-side joins and
    // checkpoint cp (it rides the cumulative windows and feeds two stages)
    val cp = cum.join(broadcast(peak), "key").filter(col("d") === col("maxd"))
      .groupBy("key").agg(min(col("tsn")).as("cp_ts"),
        max(col("n")).as("n"), max(col("maxd")).as("maxd"))
      .checkpoint(eager = true)
    val sides = rows.join(broadcast(cp.select("key", "cp_ts")), "key")
      .groupBy("key").agg(
        sum(when(col("tsn") <= col("cp_ts"), col("v"))).as("sb"),
        count(when(col("tsn") <= col("cp_ts"), lit(1))).as("nb"),
        sum(when(col("tsn") > col("cp_ts"), col("v"))).as("sa"),
        count(when(col("tsn") > col("cp_ts"), lit(1))).as("na"))
    val mb = col("sb").cast("double") / col("nb").cast("double")
    val ma = col("sa").cast("double") / col("na").cast("double")
    cp.join(sides, "key").select(col("key"), col("n"), col("cp_ts"),
      round(col("maxd").cast("double") / col("n").cast("double"), 6)
        .as("cusum"),
      round(mb, 6).as("mean_before"),
      when(col("na") > 0, round(ma, 6)).as("mean_after"),
      when(col("na") > 0, round(ma - mb, 6)).otherwise(lit(0.0)).as("shift"))
  }

  /** Exponential inter-arrival fit + Kolmogorov–Smirnov distance per key:
    * estimate the arrival rate from the gaps of the (ts, id)-ordered
    * series, then measure how far the empirical gap distribution sits
    * from Exponential(λ̂) — the burstiness detector (a Poisson-looking
    * source has KS ≈ 0; a crawler that batches or stalls shows heavy KS)
    * behind an ingest-health panel.
    *
    * λ̂ = n_gaps/Σgaps from EXACT long nanosecond sums; the KS statistic
    * is max over sorted gaps of max(k/n − F(g_k), F(g_k) − (k−1)/n) with
    * F(g) = 1 − exp(−λ̂·g), each term a fixed-parenthesization round-6
    * double (the round-6 libm rule). `ks_crit` is the 5% asymptotic
    * 1.36/√n line. Keys with all-identical timestamps (Σgaps = 0, no
    * definable rate) are dropped.
    *
    * Scale shape: lag + rank windows over one (key)-partitioned sort,
    * then a per-key aggregate — the changepoint stance. Output:
    * (key, n_gaps, rate_per_hour, ks_stat, ks_crit, exp_reject). */
  def interarrivalKs(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val rows = df.select(col(keyCol).cast("string").as("key"),
      col(tsCol).cast("long").as("tsn"), col(idCol).cast("long").as("rid"))
    val wOrd = Window.partitionBy("key").orderBy(col("tsn"), col("rid"))
    val gaps = rows
      .withColumn("gap", col("tsn") - lag(col("tsn"), 1).over(wOrd))
      .filter(col("gap").isNotNull)
    val wAll = Window.partitionBy("key")
    val ranked = gaps
      .withColumn("k", row_number().over(
        Window.partitionBy("key").orderBy(col("gap"), col("tsn"), col("rid")))
        .cast("long"))
      .withColumn("ng", count(lit(1)).over(wAll))
      .withColumn("sg", sum(col("gap")).over(wAll))
      .filter(col("sg") > 0)
    val lam = col("ng").cast("double") / col("sg").cast("double")
    val fk = lit(1.0) - exp(-lam * col("gap").cast("double"))
    val term = round(greatest(
      col("k").cast("double") / col("ng").cast("double") - fk,
      fk - (col("k") - 1L).cast("double") / col("ng").cast("double")), 6)
    ranked.withColumn("term", term)
      .groupBy("key")
      .agg(max(col("ng")).as("n_gaps"), max(col("sg")).as("sg"),
        max(col("term")).as("ks_stat"))
      .select(col("key"), col("n_gaps"),
        round(col("n_gaps").cast("double") / col("sg").cast("double")
          * lit(3600000000000.0), 6).as("rate_per_hour"),
        col("ks_stat"),
        round(lit(1.36) / sqrt(col("n_gaps").cast("double")), 6).as("ks_crit"),
        (col("ks_stat") > round(lit(1.36) / sqrt(col("n_gaps").cast("double")), 6))
          .as("exp_reject"))
  }

  /** Exponentially time-decayed top-k per group — "trending items": each
    * event contributes `0.5^(age / halfLife)` to its item's score, so a
    * burst of recent activity outranks a larger but stale total (the
    * decayed-count stream-analytics staple, e.g. Cormode et al.'s
    * forward-decay formulation, VLDB'09, computed here at rest).
    *
    * Determinism/portability: `asOf` is the corpus max timestamp (a 1-row
    * aggregate cross-joined into the plan — a catalog statistic, no driver
    * state); age quantizes to whole hours by INTEGER floor-division of the
    * nanosecond timestamps (exact at any epoch magnitude, where double
    * division is not), each weight = round(0.5^(age_h/halfLife_h), 6) (the
    * round-6 libm rule) and scores are DECIMAL(38,6) sums of those —
    * reduction-order-independent, so ranks replay exactly in SQL.
    *
    * Scale shape: one word-count-shaped (group, item) aggregate (map-side
    * combined), then the bounded [[graft.functions.RowTopKAggregator]]
    * carries at most k rows per partition per group — no global window,
    * no corpus-sized sort. Output: (group, item, score, rank), score
    * rounded to 6, rank 1..k by (score desc, item asc). */
  def decayedTopK(df: DataFrame, groupCol: String, itemCol: String,
      tsCol: String, halfLifeHours: Long, k: Int): DataFrame = {
    require(halfLifeHours > 0 && k > 0, "halfLifeHours and k must be positive")
    import df.sparkSession.implicits._
    val asOf = df.agg(max(col(tsCol)).as("__asof"))
    val scored = df
      .select(col(groupCol).cast("string").as("g"),
        col(itemCol).cast("long").as("item"), col(tsCol).cast("long").as("tsn"))
      .crossJoin(asOf)
      .withColumn("age_h", expr("(__asof - tsn) div 3600000000000"))
      .withColumn("wt", round(pow(lit(0.5),
        col("age_h").cast("double") / lit(halfLifeHours.toDouble)), 6)
        .cast("decimal(38,6)"))
      .groupBy("g", "item")
      .agg(sum(col("wt")).cast("double").as("score"))
    val ord: Ordering[((Double, Long), Double)] =
      Ordering.by[((Double, Long), Double), (Double, Long)](_._1)(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    scored
      .select(col("g"), (-col("score")).as("negscore"), col("item"), col("score"))
      .as[(String, Double, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => ((r._2, r._3), r._4))
      .agg(new graft.functions.RowTopKAggregator(k, ord).toColumn)
      .toDF("g", "topk")
      .select(col("g").as(groupCol), posexplode(col("topk")))
      .select(col(groupCol), col("col._1._2").as(itemCol),
        round(col("col._2"), 6).as("score"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
