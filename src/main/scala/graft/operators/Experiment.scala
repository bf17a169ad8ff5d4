package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation-platform readouts beyond the plain z/t tests
  * ([[Stats.twoProportionZTest]], [[Stats.welchTTest]]): the standard
  * trustworthy-experiment toolkit — sample-ratio-mismatch guardrail,
  * CUPED variance reduction (Deng, Xu, Kohavi & Walker WSDM'13),
  * difference-in-differences, and conversion attribution — every one
  * expressed as sufficient-statistic aggregates with fixed double
  * formulas, the q84/q137 discipline.
  *
  * Scale shape: each readout is one or two word-count-shaped aggregates
  * (per-unit rollup, then a global or per-group collapse); nothing wider
  * than (units) reaches an exchange, and every cross-row sum is a DECIMAL
  * of exact or round-6 terms — reduction-order-independent, replayable by
  * the SQL oracle.
  */
object Experiment {

  /** Sample-ratio-mismatch check: Pearson goodness-of-fit of observed arm
    * counts against the design shares — THE guardrail that invalidates an
    * experiment before any metric is read (a 50/50 split showing 50.5/49.5
    * at scale means broken assignment, not luck).
    *
    * One conditional-count aggregate over assignment rows; the chi-square
    * statistic evaluates on the ≤ |arms| count table: term_i =
    * round((o_i − n·p_i)²/(n·p_i), 6), summed as DECIMAL(38,6). No
    * p-value column (chi-square CDF is not portable arithmetic);
    * `suspect` flags chi2 above the α=0.05 critical value for
    * dof = |arms| − 1 (built-in table for dof 1..10; pass `critical` for
    * a different α or dof > 10). Observed arms absent from the design are
    * never silently dropped: the totals `n` counts only designed arms, the
    * stray rows are counted in `unexpected_arms`, and any stray arm flips
    * `suspect` (broken assignment by definition). */
  def srmCheck(df: DataFrame, armCol: String, expected: Seq[(String, Double)],
      critical: Option[Double] = None): DataFrame = {
    require(expected.nonEmpty && math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      "expected shares must sum to 1")
    val dof = expected.size - 1
    val crit = critical.getOrElse(chi2Critical95.getOrElse(dof,
      throw new IllegalArgumentException(
        s"no built-in 95% chi-square critical for dof=$dof; pass `critical`")))
    val allObs = df.select(col(armCol).cast("string").as("arm"))
      .groupBy("arm").agg(count(lit(1)).as("o"))
    val exp = df.sparkSession.range(1)
      .select(explode(array(expected.map { case (a, p) =>
        struct(lit(a).as("arm"), lit(p).as("p"))
      }: _*)).as("s"))
      .select(col("s.arm").as("arm"), col("s.p").as("p"))
    val obs = allObs.join(broadcast(exp.select("arm")), Seq("arm"), "left_semi")
    val stray = allObs.join(broadcast(exp.select("arm")), Seq("arm"), "left_anti")
      .agg(count(lit(1)).as("unexpected_arms"))
    val tot = obs.agg(sum(col("o")).cast("bigint").as("n"))
    val terms = broadcast(exp).join(obs, Seq("arm"), "left").crossJoin(tot)
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("e", col("n").cast("double") * col("p"))
      .withColumn("term", round((col("o").cast("double") - col("e"))
        * (col("o").cast("double") - col("e")) / col("e"), 6))
    terms.agg(
        sum(col("term").cast("decimal(38,6)")).cast("double").as("chi2raw"),
        count(lit(1)).as("k"), max(col("n")).as("n"))
      .crossJoin(stray)
      .select(round(col("chi2raw"), 6).as("chi2"), (col("k") - 1L).as("dof"),
        col("n"), col("unexpected_arms"),
        (round(col("chi2raw"), 6) > crit || col("unexpected_arms") > 0L)
          .as("suspect"))
  }

  /** Upper-tail chi-square critical values at α = 0.05, dof 1..10 — the
    * standard table (Abramowitz & Stegun 26.4), round-6. */
  private val chi2Critical95: Map[Int, Double] = Map(
    1 -> 3.841459, 2 -> 5.991465, 3 -> 7.814728, 4 -> 9.487729,
    5 -> 11.070498, 6 -> 12.591587, 7 -> 14.06714, 8 -> 15.507313,
    9 -> 16.918978, 10 -> 18.307038)

  /** CUPED variance reduction: per-unit pre-period covariate x and
    * experiment-period metric y, adjusted metric y' = y − θ(x − x̄) with
    * θ = cov(x, y)/var(x) — removes the covariate-explained variance so
    * the same experiment detects effects ~var_reduction sooner.
    *
    * Two aggregates: the per-unit (x, y) rollup (values as DECIMAL(18,6)
    * sums), then ONE global pass for the five cross-moments (n, Σx, Σy,
    * Σxy, Σx², Σy² as decimal sums of round-6 per-unit values). θ and the
    * variance ratio evaluate once, in doubles, fixed parenthesization:
    *   θ = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
    *   var_y    = (n·Σy² − Σy·Σy) / (n·(n−1))
    *   var_yadj = var_y − θ²·var_x   (the CUPED identity)
    * Output: one row (n, theta, var_y, var_yadj, var_reduction_pct),
    * round-6. Units with no pre-period activity carry x = 0 (the standard
    * zero-imputation). */
  def cuped(df: DataFrame, unitCol: String, tsCol: String, valueCol: String,
      cutTs: Long): DataFrame = {
    def d6(c: Column): Column = c.cast("decimal(18,6)")
    val perUnit = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(unitCol).as("unit"))
      .agg(
        // re-cast the (p+10, 6) sum back to (18,6): exact at per-unit
        // magnitudes, and keeps the x*y / x*x products inside DECIMAL(38)
        // so no precision-capping rounding can creep in
        coalesce(sum(when(col(tsCol) < cutTs, d6(col(valueCol)))),
          lit(0).cast("decimal(18,6)")).cast("decimal(18,6)").as("x"),
        coalesce(sum(when(col(tsCol) >= cutTs, d6(col(valueCol)))),
          lit(0).cast("decimal(18,6)")).cast("decimal(18,6)").as("y"))
    val m = perUnit.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"))
    val dxx = n * sxx - sx * sx
    val theta = (n * sxy - sx * sy) / dxx
    val varY = (n * syy - sy * sy) / (n * (n - lit(1.0)))
    val varX = dxx / (n * (n - lit(1.0)))
    val varAdj = varY - theta * theta * varX
    m.filter(col("n") >= 2 && round(dxx, 9) =!= 0.0)
      .select(col("n"), round(theta, 6).as("theta"),
        round(varY, 6).as("var_y"), round(varAdj, 6).as("var_yadj"),
        round((varY - varAdj) / varY * 100.0, 6).as("var_reduction_pct"))
  }

  /** Difference-in-differences: the 2×2 (arm × period) cell means and the
    * interaction effect (Δtreat − Δcontrol) — the standard observational
    * readout when assignment isn't randomized but trends are parallel.
    * `treatCol` is a boolean column; period splits at `cutTs`. One
    * conditional aggregate (4 cells on the exchange); cell means are
    * decimal-sum/count, the effect one fixed double formula, round-6. */
  def diffInDiff(df: DataFrame, treatCol: String, tsCol: String,
      valueCol: String, cutTs: Long): DataFrame = {
    def d6(c: Column): Column = c.cast("decimal(18,6)")
    def cell(t: Boolean, post: Boolean): (Column, Column) = {
      val p = (col(treatCol) === t) &&
        (if (post) col(tsCol) >= cutTs else col(tsCol) < cutTs)
      (sum(when(p, d6(col(valueCol)))), count(when(p, 1)))
    }
    val ((sCpre, nCpre), (sCpost, nCpost)) = (cell(false, false), cell(false, true))
    val ((sTpre, nTpre), (sTpost, nTpost)) = (cell(true, false), cell(true, true))
    val m = df.filter(col(valueCol).isNotNull).agg(
      sCpre.as("s_c_pre"), nCpre.as("n_c_pre"), sCpost.as("s_c_post"),
      nCpost.as("n_c_post"), sTpre.as("s_t_pre"), nTpre.as("n_t_pre"),
      sTpost.as("s_t_post"), nTpost.as("n_t_post"))
    def mean(s: String, c: String): Column =
      col(s).cast("double") / col(c).cast("double")
    val (mcPre, mcPost) = (mean("s_c_pre", "n_c_pre"), mean("s_c_post", "n_c_post"))
    val (mtPre, mtPost) = (mean("s_t_pre", "n_t_pre"), mean("s_t_post", "n_t_post"))
    m.select(
      round(mcPre, 6).as("mean_c_pre"), round(mcPost, 6).as("mean_c_post"),
      round(mtPre, 6).as("mean_t_pre"), round(mtPost, 6).as("mean_t_post"),
      round((mtPost - mtPre) - (mcPost - mcPre), 6).as("did_effect"))
  }

  /** Conversion attribution within a lookback window: each conversion
    * credits the touchpoints the same unit produced in the `lookback`
    * before it — `last` (full credit to the latest touch) and `linear`
    * (1/k to each of the k touches) models side by side, per channel.
    *
    * Scale shape: the touch↔conversion pairing is a per-unit equi-join
    * with a time-range predicate — co-partitioned on the unit key, never
    * corpus×corpus (the [[AsOfJoin]] argument); per-conversion touch
    * counts and last-touch picks are per-conversion windows (bounded by a
    * unit's lookback activity); the final rollup is channel-sized. Linear
    * credits are DECIMAL(28,9) sums of round-9 fractions. Conversions
    * with NO preceding touch land in channel "(none)" — attribution
    * reports must account for every conversion. */
  def attribution(events: DataFrame, unitCol: String, typeCol: String,
      tsCol: String, idCol: String, conversionType: String,
      touchTypes: Seq[String], lookback: Long): DataFrame = {
    require(touchTypes.nonEmpty && lookback > 0)
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(unitCol).as("unit"), col(tsCol).as("cts"), col(idCol).as("cid"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(unitCol).as("unit"), col(typeCol).as("channel"),
        col(tsCol).as("tts"), col(idCol).as("tid"))
    val pairs = conv.join(touch, Seq("unit"))
      .filter(col("tts") < col("cts") && col("tts") >= col("cts") - lookback)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cid")
    val wLast = w.orderBy(col("tts").desc, col("tid").desc)
    val credited = pairs
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(wLast))
      .withColumn("linear",
        round(lit(1.0) / col("k").cast("double"), 9).cast("decimal(28,9)"))
    val perChannel = credited.groupBy("channel").agg(
      sum(when(col("rn") === 1, 1L).otherwise(0L)).as("conv_last"),
      sum(col("linear")).cast("double").as("credit_linear"),
      countDistinct(col("cid")).as("n_conversions_touched"))
    val orphan = conv.join(credited.select(col("cid")).distinct(),
        Seq("cid"), "left_anti")
      .agg(count(lit(1)).as("conv_last"))
      .select(lit("(none)").as("channel"), col("conv_last"),
        col("conv_last").cast("double").as("credit_linear"),
        col("conv_last").as("n_conversions_touched"))
      .filter(col("conv_last") > 0)
    perChannel
      .select(col("channel"), col("conv_last"),
        round(col("credit_linear"), 6).as("credit_linear"),
        col("n_conversions_touched"))
      .unionByName(orphan
        .select(col("channel"), col("conv_last"),
          round(col("credit_linear"), 6).as("credit_linear"),
          col("n_conversions_touched")))
  }

  /** Bradley–Terry strength ranking from pairwise outcomes (Bradley &
    * Terry, Biometrika 1952; Hunter's MM iteration, Ann. Stat. 2004) —
    * the preference-data staple: rank items (sources, models, prompts)
    * from "A beat B" rows, the aggregation step behind reward-model
    * training sets.
    *
    * FIXED `iters` MM rounds (the q69 fixed-rounds discipline) over
    * p_i ← W_i / Σ_j n_ij/(p_i + p_j): each round is one join of the
    * (dimension-sized) strength table onto the symmetric pair-count
    * table + one aggregate back to items. Per-round terms are round-6
    * doubles summed as DECIMAL(38,6) — reduction-order-independent —
    * and the update divides once, round-6, clamped below at 1e-6 so an
    * all-losses item (strength → 0) can never zero a later denominator.
    * The oracle unrolls the same rounds verbatim.
    *
    * Scale shape: ONE corpus-sized aggregate builds (i, j, n_ij, w_ij);
    * every round after runs on pair/item-sized tables (bounded by
    * distinct matchups, not match rows). The matchup and item tables are
    * eagerly checkpointed before the fold — each round references the
    * strength table twice, so without the lineage barrier the composed
    * plan would re-embed the corpus-sized match aggregate 2^iters times
    * (the q69/q89 lesson; measured 52 s -> sub-second on a 1M-match
    * probe). Output: (item, wins, games, strength, strength_share),
    * share = p/Σp round-6. Cold wrapper over the warm-foldable
    * [[btInit]]/[[btRounds]] state (the [[Graph.rankInit]] pattern). */
  def bradleyTerry(matches: DataFrame, winnerCol: String = "winner",
      loserCol: String = "loser", iters: Int = 5): DataFrame =
    btScores(btRounds(btInit(matches, winnerCol, loserCol), iters))

  /** Warm Bradley–Terry state, the [[Graph.RankState]] pattern for
    * preference aggregation: `pairCounts` is the canonical (i < j)
    * matchup table (i, j, n, w_i) — n games, w_i wins by the smaller-named
    * item — checkpointed; `strengths` the item-sized (item, p) iterate. A
    * daemon folds new match batches with [[btInsert]]; the count fold is
    * PURELY ADDITIVE (per-matchup sums), which is what makes this family
    * the cleanest warm fold: merging state is one pair-type-sized
    * aggregate, no graph relayout. */
  final case class BtState private[operators] (
      pairCounts: DataFrame, strengths: DataFrame)

  /** The symmetric matchup view and per-item (games, wins) table derived
    * from canonical pair counts — pair-type-sized, rebuilt per call (two
    * narrow projections + one aggregate; wins(item) folds w_i when the
    * item is the pair's smaller name and n − w_i when the larger). */
  private def btDerived(pairCounts: DataFrame): (DataFrame, DataFrame) = {
    val sym = pairCounts.select(col("i").as("a"), col("j").as("b"), col("n"))
      .unionByName(pairCounts.select(col("j").as("a"), col("i").as("b"), col("n")))
    val items = pairCounts
      .select(col("i").as("item"), col("n"), col("w_i").as("w"))
      .unionByName(pairCounts.select(col("j").as("item"), col("n"),
        (col("n") - col("w_i")).as("w")))
      .groupBy("item")
      .agg(sum(col("n")).as("games"), sum(col("w")).as("wins"))
    (sym, items)
  }

  /** Build warm state from a match frame: aggregate the canonical matchup
    * counts (the ONE corpus-sized pass) and start every item at p = 1. */
  def btInit(matches: DataFrame, winnerCol: String = "winner",
      loserCol: String = "loser"): BtState = {
    graft.util.Checkpoints.ensureDir(matches.sparkSession)
    val m = matches.select(col(winnerCol).cast("string").as("w"),
      col(loserCol).cast("string").as("l"))
    val pairCounts = m
      .select(least(col("w"), col("l")).as("i"),
        greatest(col("w"), col("l")).as("j"),
        when(col("w") < col("l"), 1L).otherwise(0L).as("wi"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("wi")).as("w_i"))
      .checkpoint(eager = true)
    val strengths = btDerived(pairCounts)._2
      .select(col("item"), lit(1.0).as("p"))
    BtState(pairCounts, strengths.checkpoint(eager = true))
  }

  /** Advance `iters` MM rounds from the CURRENT strengths (warm start)
    * and checkpoint the iterate. Identical arithmetic to the cold form
    * (round-6 terms, DECIMAL(38,6) sums, 1e-6 clamp), so cold == init +
    * rounds bit-for-bit and a warm trajectory is oracle-replayable. */
  def btRounds(st: BtState, iters: Int): BtState = {
    require(iters >= 0, "iters must be non-negative")
    if (iters == 0) return st
    // checkpoint the derived matchup views once per advance, and the
    // item-sized iterate EVERY round — each round references sym/items/p
    // twice, so an unbarriered chain re-embeds subtrees 2^rounds deep
    // (the q69/q89 lazy-composition lesson; the un-barriered form blew
    // past 15 min at 14 rounds in the fixpoint spec)
    val (symRaw, itemsRaw) = btDerived(st.pairCounts)
    val sym = symRaw.checkpoint(eager = true)
    val items = itemsRaw.checkpoint(eager = true)
    var p = st.strengths
    for (_ <- 1 to iters) {
      val denom = sym
        .join(p.select(col("item").as("a"), col("p").as("pa")), "a")
        .join(p.select(col("item").as("b"), col("p").as("pb")), "b")
        .groupBy(col("a").as("item"))
        .agg(sum(round(col("n").cast("double") / (col("pa") + col("pb")), 6)
          .cast("decimal(38,6)")).as("s"))
      p = items.join(denom, "item")
        .select(col("item"),
          greatest(round(col("wins").cast("double")
            / col("s").cast("double"), 6), lit(0.000001)).as("p"))
        .checkpoint(eager = true)
    }
    st.copy(strengths = p)
  }

  /** Fold a batch of NEW matches into the state and advance `iters` warm
    * MM rounds — the per-batch daemon path ([[Graph.lpInsert]]'s contract
    * for preference data): matchup counts merge by per-pair ADDITION (a
    * pair-type-sized aggregate — no corpus relayout, the cheapest fold in
    * the warm family), new items enter at the p = 1 init while existing
    * items keep their current strength, and the few warm rounds
    * re-converge the neighborhood the batch actually moved instead of
    * re-running the full cold budget. */
  def btInsert(st: BtState, batch: DataFrame, winnerCol: String = "winner",
      loserCol: String = "loser", iters: Int = 5): BtState = {
    val bm = batch.select(col(winnerCol).cast("string").as("w"),
      col(loserCol).cast("string").as("l"))
    val bp = bm
      .select(least(col("w"), col("l")).as("i"),
        greatest(col("w"), col("l")).as("j"),
        when(col("w") < col("l"), 1L).otherwise(0L).as("wi"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("wi")).as("w_i"))
    val merged = st.pairCounts.unionByName(bp)
      .groupBy("i", "j")
      .agg(sum(col("n")).as("n"), sum(col("w_i")).as("w_i"))
      .checkpoint(eager = true)
    val warm = btDerived(merged)._2.select(col("item"))
      .join(st.strengths, Seq("item"), "left")
      .select(col("item"), coalesce(col("p"), lit(1.0)).as("p"))
    btRounds(BtState(merged, warm.checkpoint(eager = true)), iters)
  }

  /** Fold one streaming batch of matches into AT-REST Bradley–Terry
    * state — [[btInsert]] lifted onto disk with the
    * [[Retrieval.invIndexInsert]] crash/retry protocol (the
    * [[Graph.lpCommitBatch]] sibling for preference streams; a
    * [[graft.streaming.PrefIngest]] daemon drives it per micro-batch).
    *
    * Layout under `path` — `state/` holding pair_counts/ (the canonical
    * i<j matchup table), strengths/ (the item-sized iterate) and meta/
    * (one row: last_batch), committed as ONE directory swap
    * (state_staged_b<id> → rename state away → rename staged in →
    * delete old). The additive count fold makes idempotence here purely
    * a marker question: a retry either sees last_batch == batchId
    * (no-op — the counts were already added exactly once) or redoes the
    * whole deterministic fold from the unswapped old state. No per-batch
    * data dirs are needed at all, unlike the LP tree — the accumulated
    * pairCounts IS the sufficient statistic. Entry-time recovery rolls a
    * mid-swap crash forward from the staged twin or back from the old
    * one. */
  def btCommitBatch(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, batchId: Long, winnerCol: String = "winner",
      loserCol: String = "loser", iters: Int = 2, coldIters: Int = 5): Unit = {
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    graft.util.Checkpoints.ensureDir(spark)
    val fs = Lsm.fs(spark, path)
    Lsm.recoverSwap(fs, path, "state")
    // shared entry (no marked bucket roots — state commits as ONE swap)
    val entry = Lsm.enterBatch(spark, fs, path, batchId,
      metaDir = "state/meta")
    if (entry.alreadyCommitted) return
    val lastBatch = entry.lastBatch
    val next =
      if (lastBatch < 0)
        btRounds(btInit(batch, winnerCol, loserCol), coldIters)
      else {
        val st = BtState(
          spark.read.parquet(s"$path/state/pair_counts")
            .checkpoint(eager = true),
          spark.read.parquet(s"$path/state/strengths")
            .checkpoint(eager = true))
        btInsert(st, batch, winnerCol, loserCol, iters)
      }
    import spark.implicits._
    val staged = Lsm.stagedPath(path, "state", batchId)
    fs.delete(new Path(staged), true)
    next.pairCounts.write.mode("overwrite").parquet(s"$staged/pair_counts")
    next.strengths.write.mode("overwrite").parquet(s"$staged/strengths")
    Seq(batchId).toDF("last_batch").write.mode("overwrite")
      .parquet(s"$staged/meta")
    Lsm.commitSwap(fs, path, "state", batchId)
  }

  /** The scores an at-rest [[btCommitBatch]] tree currently serves —
    * the [[bradleyTerry]] output contract off the stored iterate. */
  def btServedScores(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    btScores(BtState(spark.read.parquet(s"$path/state/pair_counts"),
      spark.read.parquet(s"$path/state/strengths")))

  /** Final scores off the current state: (item, wins, games, strength,
    * strength_share) — the [[bradleyTerry]] output contract. */
  def btScores(st: BtState): DataFrame = {
    val items = btDerived(st.pairCounts)._2
    val p = st.strengths
    val tot = p.agg(sum(col("p").cast("decimal(18,6)")).as("tp"))
    items.join(p, "item").crossJoin(tot)
      .select(col("item"), col("wins"), col("games"),
        col("p").as("strength"),
        round(col("p") / col("tp").cast("double"), 6).as("strength_share"))
  }
}
