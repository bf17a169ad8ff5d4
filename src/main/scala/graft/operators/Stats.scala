package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** EXACT global quantiles without a global sort — the two-pass
    * bucket-refinement selection (the classic distributed k-th-order-
    * statistic move; Blum et al.'s selection recast over histograms):
    *
    *  1. One aggregate pass buckets every value into `buckets` fixed-width
    *     cells and counts them (map-side combine; the ≤ buckets-row count
    *     table is the ONLY driver-side state — the bounded-collect
    *     contract, like the IVF centroid table).
    *  2. Cumulative counts locate, for each target rank k = ceil(p·n), its
    *     bucket and within-bucket rank; ONE filtered second pass ranks
    *     ONLY the targeted buckets (per-bucket windows — bucket-sized,
    *     hash-parallel) and picks the exact order statistics.
    *
    * Ties are safe by construction: equal values share a bucket, so the
    * k-th smallest VALUE is well-defined whatever the within-bucket tie
    * order. q75's histogram sketch answers the same question
    * approximately in one pass; this is the exact form whose second pass
    * touches ~(targets/buckets) of the corpus — and on a value-bucketed
    * at-rest layout the bucket filter becomes partition pruning.
    *
    * Output: (p, rank, value) per requested quantile, p in (0, 1]. */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      buckets: Int = 1024): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "exactQuantiles: probabilities must be in (0, 1]")
    require(buckets >= 2, "exactQuantiles: need at least 2 buckets")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val s = v.agg(count(lit(1)), min("v"), max("v")).collect()(0)
    val n = s.getLong(0)
    if (n == 0) return Seq.empty[(Double, Long, Double)].toDF("p", "rank", "value")
    val (mn, mx) = (s.getDouble(1), s.getDouble(2))
    val targets = ps.map(p => p -> math.ceil(p * n).toLong)
    if (mn == mx)
      return targets.map { case (p, k) => (p, k, mn) }.toDF("p", "rank", "value")
    val w = (mx - mn) / buckets
    val withB = v.withColumn("b",
      least(floor((col("v") - mn) / w).cast("long"), lit(buckets - 1L)))
    // pass 1: the bounded bucket-count table (≤ buckets rows)
    val counts = withB.groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val cumBefore = counts.scanLeft(0L)(_ + _._2).init
    val lookup = counts.map(_._1).zip(cumBefore) // bucket -> #values below it
    def locate(k: Long): (Long, Long) = {
      val i = lookup.lastIndexWhere(_._2 < k)
      (lookup(i)._1, k - lookup(i)._2)
    }
    val sel = targets.map { case (p, k) =>
      val (b, within) = locate(k); (p, k, b, within)
    }
    val wanted = sel.map(_._3).distinct
    // pass 2: rank only the targeted buckets
    val ranked = withB.filter(col("b").isin(wanted: _*))
      .withColumn("rw", row_number().over(Window.partitionBy("b").orderBy("v")))
    sel.toDF("p", "rank", "tb", "within")
      .join(ranked, col("tb") === col("b") && col("within") === col("rw"))
      .select(col("p"), col("rank"), col("v").as("value"))
  }

  /** EXACT quantiles PER GROUP without any per-group sort of the corpus —
    * [[exactQuantiles]]'s two-pass bucket refinement with every driver
    * collect replaced by a distributed stage, so it holds at any group
    * count up to [[selectRanksPerGroup]]'s broadcast bound (no driver
    * collect ever; the global form's collect is bounded by `buckets`; a
    * grouped collect would be groups × buckets — unbounded):
    *
    *  1. per-group (n, min, max) aggregate; rows bucket against their OWN
    *     group's range;
    *  2. per-(group, bucket) counts with a cumulative window over ≤
    *     `buckets` rows per group (bucket-ordered, group-partitioned —
    *     parallel);
    *  3. each target rank k = ⌈p·n⌉ locates its bucket by a range join on
    *     the cumulative table, and ONE ranked pass over just the targeted
    *     (group, bucket) cells picks the exact order statistics.
    *
    * Ties share a bucket, so the k-th smallest VALUE is well-defined. A
    * constant-valued group collapses to one bucket (its window degenerates
    * to that group's rows — the honest cost). Output: (grp, p, rank,
    * value) per group × requested p, p in (0, 1]. */
  def exactQuantilesPerGroup(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double], buckets: Int = 1024): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "exactQuantilesPerGroup: probabilities must be in (0, 1]")
    val rows = df.select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val targets = rows.groupBy("grp").agg(count(lit(1)).as("n"))
      .select(col("grp"), col("n"), explode(array(ps.map(lit): _*)).as("tag"))
      .select(col("grp"), col("tag"),
        ceil(col("tag") * col("n")).cast("long").as("k"))
    selectRanksPerGroup(rows, targets, buckets)
      .select(col("grp"), col("tag").as("p"), col("k").as("rank"), col("value"))
  }

  /** Exact per-group 1-based rank for EVERY row under (valueCol asc,
    * tieCols asc) — the grouped form of [[bucketedRanks]], shared by the
    * operators that previously each kept a per-group rank window
    * ([[giniPerGroup]], [[quantileNormalize]]): per-(group, bucket)
    * offsets from a cumulative window over ≤ `buckets` rows per group,
    * plus within-(group, bucket) row_number windows. Fully distributed
    * (no collect), and the heavy stages key on (grp, b) — a few-group
    * corpus still spreads across the cluster instead of collapsing onto
    * |groups| sort tasks. The double cast of `valueCol` only coarsens
    * buckets (monotone); ordering uses the typed columns. Adds `rank`
    * and the group size `n`. */
  private[operators] def bucketedRanksPerGroup(rowsIn: DataFrame,
      valueCol: String, tieCols: Seq[String],
      buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same null contract as bucketedRanks: null values carry no rank and
    // are excluded (least() would otherwise route them into bucket
    // buckets-1 and corrupt that bucket's ranks)
    val rows = rowsIn.filter(col(valueCol).isNotNull)
    val vd = col(valueCol).cast("double")
    val stats = rows.groupBy("grp").agg(count(lit(1)).as("n"),
      min(vd).as("mn"), max(vd).as("mx"))
    val withB = rows.join(broadcast(stats), "grp")
      .withColumn("w", when(col("mx") > col("mn"),
        (col("mx") - col("mn")) / buckets).otherwise(lit(1.0)))
      .withColumn("b", least(floor((vd - col("mn")) / col("w")).cast("long"),
        lit(buckets - 1L)))
      .drop("mn", "mx", "w")
    val cumW = Window.partitionBy("grp").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withB.groupBy("grp", "b").agg(count(lit(1)).as("c"))
      .withColumn("cb", coalesce(sum(col("c")).over(cumW), lit(0L)))
      .select("grp", "b", "cb")
    val ord = col(valueCol).asc +: tieCols.map(col(_).asc)
    withB.join(offs, Seq("grp", "b"))
      .withColumn("rank", row_number().over(
          Window.partitionBy("grp", "b").orderBy(ord: _*)).cast("long")
        + col("cb"))
      .drop("b", "cb")
  }

  /** Shared grouped order-statistic core: given per-group integer rank
    * targets (grp, tag, k) with 1 <= k <= |group|, return each target's
    * exact k-th smallest value — the distributed bucket-refinement stages
    * of [[exactQuantilesPerGroup]], factored so every "pick a per-group
    * rank" operator ([[winsorizedMeans]]' percentile bounds, the grouped
    * quantiles themselves) shares one audited shape instead of each
    * keeping its own per-group sort window. `tag` is an opaque caller
    * label carried through (a probability, a lo/hi marker).
    *
    * Broadcast bound: the stats/located/wanted side tables are GROUP-sized
    * (× target count), so this shape assumes the group count fits Spark's
    * broadcast ceiling (8 GB hard / driver memory practical — order 10⁷–10⁸
    * groups at these row widths). Beyond that, drop the `broadcast()` hints
    * and let the planner shuffle-join: the refinement stays correct — the
    * few-group-skew protection the broadcasts buy just stops mattering at
    * that cardinality, since |groups| ≫ cluster parallelism spreads fine
    * on its own. */
  private[operators] def selectRanksPerGroup(rows: DataFrame,
      targets: DataFrame, buckets: Int): DataFrame = {
    require(buckets >= 2, "selectRanksPerGroup: need at least 2 buckets")
    import org.apache.spark.sql.expressions.Window
    // the per-group range/target/located tables are GROUP-sized — broadcast
    // them so the corpus side never hash-partitions on grp (a few-group
    // input would otherwise collapse the whole refinement onto |groups|
    // tasks; with broadcasts the heavy stages key on (grp, b) and spread)
    val stats = rows.groupBy("grp").agg(min("v").as("mn"), max("v").as("mx"))
    val withB = rows.join(broadcast(stats), "grp")
      .withColumn("w", when(col("mx") > col("mn"),
        (col("mx") - col("mn")) / buckets).otherwise(lit(1.0)))
      .select(col("grp"),
        least(floor((col("v") - col("mn")) / col("w")).cast("long"),
          lit(buckets - 1L)).as("b"),
        col("v"))
    val cumW = Window.partitionBy("grp").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = withB.groupBy("grp", "b").agg(count(lit(1)).as("c"))
      .withColumn("cb", coalesce(sum(col("c")).over(cumW), lit(0L)))
    val located = targets.join(cum, Seq("grp"))
      .filter(col("cb") < col("k") && col("k") <= col("cb") + col("c"))
      .select(col("grp"), col("tag"), col("k"), col("b"),
        (col("k") - col("cb")).as("within"))
    val wanted = located.select("grp", "b").distinct()
    val ranked = withB.join(broadcast(wanted), Seq("grp", "b"))
      .withColumn("rw", row_number().over(
        Window.partitionBy("grp", "b").orderBy("v")).cast("long"))
      .select(col("grp"), col("b"), col("v"), col("rw"))
    ranked.join(broadcast(located), Seq("grp", "b"))
      .filter(col("within") === col("rw"))
      .select(col("grp"), col("tag"), col("k"), col("v").as("value"))
  }

  /** Equi-depth histogram — the optimizer-statistics artifact (equal-COUNT
    * buckets, unlike [[Sketches]]' equal-WIDTH form): bucket i of `k`
    * spans (boundary_{i-1}, boundary_i] where boundary_i is the EXACT
    * ⌈i·n/k⌉-th order statistic from [[exactQuantiles]]' bucket
    * refinement — no sort, no sampling, deterministic under ties. The
    * per-bucket counts come from ONE conditional pass against the
    * broadcast k-row boundary table (rows on a boundary value go to the
    * LOWEST bucket whose boundary admits them, so duplicate boundary
    * values yield honest zero-count buckets instead of double counting).
    * Output: (bucket 1..k, hi, n_rows) — `hi` the bucket's inclusive
    * upper boundary. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, k: Int,
      buckets: Int = 1024): DataFrame = {
    require(k >= 1, "equiDepthHistogram: need k >= 1")
    val v = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ps = (1 to k).map(i => i.toDouble / k)
    val bounds = exactQuantiles(v, "v", ps, buckets)
      .select(round(col("p") * k, 0).cast("long").as("bucket"),
        col("value").as("hi"))
    // collapse to the distinct-value table first (word-count shape), THEN
    // resolve each value's bucket against the broadcast boundaries — the
    // k-way fan-out touches values, never rows
    val valCounts = v.groupBy("v").agg(count(lit(1)).as("cnt"))
    val assigned = valCounts.crossJoin(broadcast(bounds))
      .filter(col("v") <= col("hi"))
      .groupBy("v").agg(max(col("cnt")).as("cnt"), min(col("bucket")).as("bucket"))
      .groupBy("bucket").agg(sum(col("cnt")).as("n_rows"))
    broadcast(bounds).join(assigned, Seq("bucket"), "left")
      .select(col("bucket"), col("hi"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }

  /** Median and MAD (median absolute deviation) per group — the robust
    * center/spread pair that one whale value cannot move (breakdown point
    * 50%, vs 0% for mean/σ): the outlier-gate statistic when values are
    * heavy-tailed, which corpus token counts and spend columns always are.
    * Two [[exactQuantilesPerGroup]] passes (median of v, then median of
    * |v − median|) — each is the bucket-refinement shape, no per-group
    * sort; the deviations join is one group-keyed equi-join. |v − m| is a
    * single IEEE subtraction both engines replay bit-identically. Output:
    * (grp, n, median, mad). */
  def madPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int = 1024): DataFrame = {
    val rows = df.select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // the median table feeds EVERY pass of the second refinement via the
    // deviations join — left lazy, each of those passes would re-run the
    // whole first refinement (the q69/q89 multiply-consumed-pool lesson);
    // it is group-sized, so the checkpoint is a table-stat write
    graft.util.Checkpoints.ensureDir(df.sparkSession)
    val med = exactQuantilesPerGroup(rows, "grp", "v", Seq(0.5), buckets)
      .select(col("grp"), col("value").as("median"))
      .checkpoint(eager = true)
    val dev = rows.join(broadcast(med), "grp")
      .select(col("grp"), abs(col("v") - col("median")).as("v"))
    val mad = exactQuantilesPerGroup(dev, "grp", "v", Seq(0.5), buckets)
      .select(col("grp"), col("value").as("mad"))
    rows.groupBy("grp").agg(count(lit(1)).as("n"))
      .join(med, "grp").join(mad, "grp")
      .select(col("grp"), col("n"), col("median"), col("mad"))
  }

  /** Robust per-group outlier flags by the modified z-score (Iglewicz &
    * Hoaglin '93): mz = 0.6745·(v − median)/MAD, flag |mz| > `threshold`
    * (their recommended 3.5). The median/MAD center-spread pair has a 50%
    * breakdown point, so the whales this gate exists to catch cannot
    * first inflate the gate itself — the failure mode of the mean±3σ
    * rule on heavy-tailed pipeline metrics. Groups with MAD = 0 (over
    * half the group at one value) emit no flags: there is no spread
    * signal to score against, and pretending σ exists would flag every
    * non-modal row. One [[madPerGroup]] pass + one group-keyed join +
    * a narrow filter; mz rounds to 6. Output: (grp, id, v, median, mad,
    * mz) — flagged rows only. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, threshold: Double = 3.5): DataFrame = {
    val rows = df.select(col(groupCol).cast("string").as("grp"),
        col(idCol).as("id"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    graft.util.Checkpoints.ensureDir(df.sparkSession)
    val stats = madPerGroup(rows, "grp", "v").filter(col("mad") > 0.0)
      .select(col("grp"), col("median"), col("mad"))
      .checkpoint(eager = true) // group-sized; feeds the corpus-wide score join
    val mz = round(lit(0.6745) * (col("v") - col("median")) / col("mad"), 6)
    rows.join(broadcast(stats), "grp")
      .withColumn("mz", mz)
      .filter(abs(col("mz")) > threshold)
      .select(col("grp"), col("id"), col("v"), col("median"), col("mad"),
        col("mz"))
  }

  /** Exact global 1-based rank for EVERY row under the total order
    * (`valueCol` asc, `tieCol` asc) — [[exactQuantiles]]'s bucket
    * refinement generalized from "a few target ranks" to "rank all
    * rows", replacing the single-partition sort that an unpartitioned
    * window (`ntile`/`row_number` over a global ORDER BY) would run:
    *
    *  1. one aggregate pass buckets values into ≤ `buckets` fixed-width
    *     cells and collects the count table (bounded-collect contract —
    *     ≤ `buckets` rows reach the driver, like the IVF centroid table);
    *  2. `row_number` windows partitioned BY BUCKET (parallel, spillable)
    *     plus each bucket's broadcast cumulative offset give the exact
    *     global rank.
    *
    * Equal values always share a bucket (bucketing is a function of the
    * value alone), so cross-bucket order is strict and within-bucket ties
    * break by `tieCol` — the same total order as the global window.
    * Monotone-but-lossy double casts of DECIMAL/LONG values are safe:
    * they can only merge adjacent buckets, never reorder them; ordering
    * itself uses the typed columns. A constant value column degenerates
    * to one bucket — i.e. a global sort by the tie column, which is the
    * honest cost of ranking an all-ties order. NULL values have no rank
    * under the total order and are EXCLUDED from the output (before this
    * guard, `least()` skipping nulls silently routed them into the top
    * bucket, where they ranked nulls-first and shifted real top-bucket
    * ranks); callers that must keep null-valued rows re-join on the tie
    * column. Adds `rank`. */
  def bucketedRanks(dfIn: DataFrame, valueCol: String, tieCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "bucketedRanks: need at least 2 buckets")
    import org.apache.spark.sql.expressions.Window
    val spark = dfIn.sparkSession
    import spark.implicits._
    val df = dfIn.filter(col(valueCol).isNotNull)
    val vd = col(valueCol).cast("double")
    val s = df.agg(min(vd).as("mn"), max(vd).as("mx")).collect()(0)
    if (s.isNullAt(0)) return df.withColumn("rank", lit(null).cast("long"))
    val (mn, mx) = (s.getDouble(0), s.getDouble(1))
    val w = if (mx > mn) (mx - mn) / buckets else 1.0
    val withB = df.withColumn("b",
      least(floor((vd - mn) / w).cast("long"), lit(buckets - 1L)))
    val counts = withB.groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init)
    val offDf = broadcast(offsets.toSeq.toDF("b", "off"))
    withB.join(offDf, "b")
      .withColumn("rank", row_number().over(
          Window.partitionBy("b").orderBy(col(valueCol).asc, col(tieCol).asc))
        .cast("long") + col("off"))
      .drop("b", "off")
  }

  /** Two-proportion z-test — the A/B experiment readout (standard normal
    * approximation with the pooled variance; e.g. Casella & Berger §10.3):
    *
    *   z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled
    *
    * over a frame of (group ∈ {exactly two values}, success 0/1) rows.
    * Everything reduces to FOUR integers (per-group trials and successes)
    * via one conditional-count aggregate — map-side combine, a single
    * 1-row exchange at any corpus size — then one fixed-parenthesization
    * double formula, round-6. `significant` applies the two-sided 5%
    * normal critical value 1.959964.
    *
    * Output: one row (group_a, group_b, n_a, x_a, n_b, x_b, p_a, p_b,
    * diff, z, significant), groups ordered ascending. */
  def twoProportionZTest(df: DataFrame, groupCol: String,
      successCol: String): DataFrame = {
    val agg = df.select(col(groupCol).cast("string").as("g"),
        col(successCol).cast("long").as("s"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("s")).as("x"))
      .orderBy("g").limit(2)
    val a = agg.select(col("g").as("group_a"), col("n").as("n_a"), col("x").as("x_a"))
      .limit(1)
    val b = agg.orderBy(col("g").desc).limit(1)
      .select(col("g").as("group_b"), col("n").as("n_b"), col("x").as("x_b"))
    val j = a.crossJoin(b).filter(col("group_a") =!= col("group_b"))
    val pa = col("x_a").cast("double") / col("n_a").cast("double")
    val pb = col("x_b").cast("double") / col("n_b").cast("double")
    val pp = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val z = (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    j.select(col("group_a"), col("group_b"), col("n_a"), col("x_a"),
      col("n_b"), col("x_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      round(pa - pb, 6).as("diff"), round(z, 6).as("z"),
      (abs(round(z, 6)) > 1.959964).as("significant"))
  }

  /** Exact ROC-AUC (Mann–Whitney U with tie-averaged ranks) of a score
    * column against a binary label — the classifier-quality readout for
    * curation models (q103's Naive Bayes, quality gates): AUC = P(score of
    * a random positive > score of a random negative) + ½·P(equal).
    *
    * Physical shape: never a global sort of the corpus. Rows collapse to
    * one (cnt, pos) row PER DISTINCT SCORE (hash aggregate, map-side
    * combine); the rank arithmetic then runs over the distinct-score table
    * only. Its running sum is a single-partition window over distinct
    * scores — fine up to millions of distinct values (callers with
    * unbounded score domains round scores first; the recursive bucketing of
    * Audit.gapDetails is the drop-in fix if a score domain ever outgrows
    * one task).
    *
    * Exactness: tie-averaged ranks are half-integers, so everything is
    * carried in DOUBLED rank units (rank2 = 2·cumBefore + cnt + 1) — pure
    * long arithmetic, any partitioning, any engine — and the single double
    * division happens once at the end:
    *   AUC = (S2 - 2·U_min/2) ... concretely
    *   S2  = Σ_positives rank2,   AUC = (S2 - npos·(npos+1)) / (2·npos·nneg)
    * Output: one row (n_pos, n_neg, auc round-6). Degenerate inputs (no
    * positives or no negatives) yield an empty frame rather than a 0/0. */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = df
      .select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("long").as("lab"))
      .filter(col("s").isNotNull && col("lab").isNotNull)
      .groupBy("s")
      .agg(count(lit(1)).as("cnt"), sum(col("lab")).as("pos"))
    val w = Window.orderBy("s")
    val ranked = perScore
      .withColumn("cumBefore",
        coalesce(sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("rank2", lit(2L) * col("cumBefore") + col("cnt") + lit(1L))
    ranked.agg(sum(col("pos")).as("n_pos"),
        sum(col("cnt") - col("pos")).as("n_neg"),
        sum(col("pos") * col("rank2")).as("s2"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("n_pos"), col("n_neg"),
        round((col("s2") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double")
          / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6).as("auc"))
  }

  /** Per-group two-feature ordinary least squares — y = b0 + b1·x1 + b2·x2
    * fit in closed form from the normal equations (Cramer's rule on the
    * 3×3 Gram matrix), the multi-feature extension of [[trendPerGroup]].
    * The pipeline use: thousands of per-slice regressions (quality vs
    * length and repetition per source; cost vs size and depth per job
    * class) in ONE aggregation pass — no solver loop, no ML library, no
    * driver iteration.
    *
    * Scale shape: a single groupBy computing nine sufficient statistics
    * (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y) that all
    * partial-combine map-side — one node-sized exchange regardless of
    * group cardinality or skew; the closed-form solve is a narrow per-row
    * formula afterwards.
    *
    * Determinism: inputs quantize to DECIMAL(18,6) so every product is
    * exact and every sum is association-order-independent; the sums cast
    * to double ONCE and the determinant/solve formulas are fixed-shape
    * IEEE arithmetic any engine replays bit-identically, rounded to 6 at
    * the end. Groups with a singular Gram matrix (det rounds to 0 at the
    * 1e-9 guard: collinear or constant features, n < 3) are dropped —
    * emitting garbage coefficients would be worse than absence.
    * Output: (group, n, b0, b1, b2, r2). */
  def ols2(df: DataFrame, groupCol: String, yCol: String,
      x1Col: String, x2Col: String): DataFrame = {
    def d6(c: Column): Column = c.cast("decimal(18,6)")
    val (x1, x2, y) = (d6(col(x1Col)), d6(col(x2Col)), d6(col(yCol)))
    val sums = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(x1).as("s1"), sum(x2).as("s2"),
        sum(y).as("sy"), sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"),
        sum(x2 * x2).as("s22"), sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"),
        sum(y * y).as("syy"))
    val dbl = sums.select(Seq(col(groupCol), col("n")) ++
      Seq("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
        .map(c => col(c).cast("double").as(c)): _*)
    // Cramer: A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], rhs = [sy,s1y,s2y].
    // Cofactor terms written once and reused so the SQL mirror can replay
    // the exact IEEE evaluation order.
    val m = dbl
      .withColumn("nd", col("n").cast("double"))
      .withColumn("m0", col("s11") * col("s22") - col("s12") * col("s12"))
      .withColumn("m1", col("s1") * col("s22") - col("s12") * col("s2"))
      .withColumn("m2", col("s1") * col("s12") - col("s11") * col("s2"))
      .withColumn("det", col("nd") * col("m0") - col("s1") * col("m1")
        + col("s2") * col("m2"))
      .filter(round(col("det"), 9) =!= 0.0)
      .withColumn("b0", (col("sy") * col("m0")
        - col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
        + col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y")))
        / col("det"))
      .withColumn("b1", (col("nd") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
        - col("sy") * col("m1")
        + col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2")))
        / col("det"))
      .withColumn("b2", (col("nd") * (col("s11") * col("s2y") - col("s1y") * col("s12"))
        - col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
        + col("sy") * col("m2"))
        / col("det"))
      .withColumn("sst", col("syy") - col("sy") * col("sy") / col("nd"))
      .withColumn("sse", col("syy") - (col("b0") * col("sy")
        + col("b1") * col("s1y") + col("b2") * col("s2y")))
    m.select(col(groupCol), col("n"),
      round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
      round(col("b2"), 6).as("b2"),
      round(lit(1.0) - col("sse") / col("sst"), 6).as("r2"))
  }

  /** Welch's unequal-variance t-test between the first two groups (by
    * ascending group name) of `df(groupCol, valueCol)` — the mean-difference
    * readout for continuous experiment metrics (revenue per user, latency),
    * complementing [[twoProportionZTest]]'s conversion-rate form.
    *
    * Sufficient statistics only: per-arm (n, Σv, Σv²) with v cast to
    * DECIMAL(18,6) (the sibling-operator width: |v| up to 1e12 without
    * ANSI overflow, and the Σv² products still fit DECIMAL(38)) — exact, map-side-combined, two rows reach the driver
    * plan regardless of corpus size. Mean / variance / t / Welch–
    * Satterthwaite df then evaluate ONCE per comparison in doubles with
    * fixed parenthesization:
    *
    *   var = (Σv² − Σv·Σv/n) / (n−1)
    *   t   = (m_a − m_b) / sqrt(var_a/n_a + var_b/n_b)
    *   df  = (var_a/n_a + var_b/n_b)² /
    *         ((var_a/n_a)²/(n_a−1) + (var_b/n_b)²/(n_b−1))
    *
    * `significant` uses the z critical value 1.959964 — the df here is in
    * the thousands for any corpus-scale arm, where t ≈ z (documented
    * approximation; small-sample callers read t/df directly). */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    def d6(c: Column): Column = c.cast("decimal(18,6)")
    val v = d6(col(valueCol))
    val agg = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"), v.as("v"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("svv"))
      .orderBy("g").limit(2)
    val a = agg.limit(1).select(col("g").as("group_a"), col("n").as("n_a"),
      col("sv").as("sv_a"), col("svv").as("svv_a"))
    val b = agg.orderBy(col("g").desc).limit(1)
      .select(col("g").as("group_b"), col("n").as("n_b"),
        col("sv").as("sv_b"), col("svv").as("svv_b"))
    val j = a.crossJoin(b).filter(col("group_a") =!= col("group_b"))
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def vr(svv: Column, sv: Column, n: Column) =
      (svv.cast("double") - sv.cast("double") * sv.cast("double") / n.cast("double")) /
        (n.cast("double") - lit(1.0))
    val (na, nb) = (col("n_a"), col("n_b"))
    val (ma, mb) = (mean(col("sv_a"), na), mean(col("sv_b"), nb))
    val (va, vb) = (vr(col("svv_a"), col("sv_a"), na), vr(col("svv_b"), col("sv_b"), nb))
    val (sea, seb) = (va / na.cast("double"), vb / nb.cast("double"))
    val t = (ma - mb) / sqrt(sea + seb)
    val dof = (sea + seb) * (sea + seb) /
      (sea * sea / (na.cast("double") - lit(1.0)) +
        seb * seb / (nb.cast("double") - lit(1.0)))
    j.filter(na >= 2 && nb >= 2)
      .select(col("group_a"), col("group_b"), na, nb,
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        round(ma - mb, 6).as("diff"), round(t, 6).as("t"),
        round(dof, 6).as("df"),
        (abs(round(t, 6)) > 1.959964).as("significant"))
  }

  /** Pearson chi-square test of independence over the (rowCol, colCol)
    * contingency table, plus Cramér's V effect size — "is document source
    * independent of language", "does payment method depend on region".
    *
    * Scale shape: ONE corpus-sized aggregate (the cell-count groupBy —
    * word-count-shaped, map-side combined); margins and the test statistic
    * derive from the cell table, which is |rows|×|cols| — bounded by the
    * category cross product, never the corpus. Each cell's
    * (o−e)²/e term is rounded to 6 decimals and summed as DECIMAL(38,6),
    * so the statistic is reduction-order-independent. No p-value column —
    * the chi-square CDF is not portable arithmetic; callers compare chi2
    * against their critical value for `dof`. */
  def chiSquareIndependence(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df
      .filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .select(col(rowCol).cast("string").as("r"), col(colCol).cast("string").as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("r").agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy("c").agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("nn"))
    val terms = cells.join(rowTot, "r").join(colTot, "c").crossJoin(tot)
      .withColumn("e", col("rt").cast("double") * col("ct").cast("double") /
        col("nn").cast("double"))
      .withColumn("term", round((col("o").cast("double") - col("e")) *
        (col("o").cast("double") - col("e")) / col("e"), 6))
    terms
      .agg(sum(col("term").cast("decimal(38,6)")).cast("double").as("chi2"),
        (countDistinct(col("r")) - 1L).as("dof_r"),
        (countDistinct(col("c")) - 1L).as("dof_c"),
        max(col("nn")).as("n"))
      .select(round(col("chi2"), 6).as("chi2"),
        (col("dof_r") * col("dof_c")).as("dof"), col("n"),
        round(sqrt(col("chi2") / (col("n").cast("double") *
          least(col("dof_r"), col("dof_c")).cast("double"))), 6).as("cramers_v"))
  }

  /** Per-group Gini coefficient over non-negative values — concentration
    * of activity/revenue ("do 1% of users produce 90% of events"), the
    * power-law health check every marketplace and every training-corpus
    * source-mix audit runs. Rank formulation (ascending values):
    *
    *   G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n
    *
    * Σ i·xᵢ is an exact DECIMAL sum (rank × DECIMAL(18,6) value); ties may
    * take ranks in any order without changing the sum (equal x across a
    * rank block), so the statistic is deterministic despite the arbitrary
    * tie order. The per-group rank is a per-key window sort — spillable,
    * the q138 refinement is the swap-in for groups that outgrow sort.
    * Output: (grp, n, total, gini), money/total round-6, gini in [0, 1)
    * (0 = perfectly equal). Groups need n ≥ 1 and Σx > 0. */
  def giniPerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val rows = df.select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("decimal(18,6)").as("x"))
      .filter(col("x").isNotNull && col("x") >= 0)
    // rank every row via the grouped bucket refinement (Σ x·r is
    // invariant under tie permutations, so bucketed ranks replay the
    // window form exactly) — no per-group sort of the corpus
    val ranked = bucketedRanksPerGroup(rows, "x", Nil)
    val agg = ranked.groupBy("grp").agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("rank")).as("srx"))
    agg.filter(col("sx").cast("double") > 0.0)
      .select(col("grp"), col("n"),
        round(col("sx").cast("double"), 6).as("total"),
        round(lit(2.0) * col("srx").cast("double") /
          (col("n").cast("double") * col("sx").cast("double"))
          - (col("n").cast("double") + lit(1.0)) / col("n").cast("double"), 6)
          .as("gini"))
  }

  /** Pairwise Pearson correlation matrix over a fixed column list — the
    * feature-redundancy profile ("is discount just a function of quantity")
    * run before model features or mixture covariates are chosen. One melt
    * (a row per (row, pair)) + ONE word-count-shaped aggregate: per-pair
    * (n, Σx, Σy, Σxy, Σx², Σy²) as exact DECIMAL(18,6)-cast sums, then the
    * [[trendPerGroup]] correlation formula once per pair, round-6. Pairs
    * are the upper triangle, named "a~b" in the caller's column order.
    * Rows where either side is null drop from that pair only. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    def d6(c: Column): Column = c.cast("decimal(18,6)")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield struct(lit(s"${cols(i)}~${cols(j)}").as("pair"),
      col(cols(i)).cast("double").as("x"), col(cols(j)).cast("double").as("y"))
    val melted = df.select(explode(array(pairs: _*)).as("m"))
      .select(col("m.pair").as("pair"), col("m.x").as("x"), col("m.y").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val m = melted.groupBy("pair").agg(count(lit(1)).as("n"),
      sum(d6(col("x"))).as("sx"), sum(d6(col("y"))).as("sy"),
      sum(d6(col("x")) * d6(col("y"))).as("sxy"),
      sum(d6(col("x")) * d6(col("x"))).as("sxx"),
      sum(d6(col("y")) * d6(col("y"))).as("syy"))
    val n = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"))
    val dxx = n * sxx - sx * sx
    val dyy = n * syy - sy * sy
    m.filter(col("n") >= 2)
      .select(col("pair"), col("n"),
        when(round(dxx, 9) === 0.0 || round(dyy, 9) === 0.0, lit(0.0))
          .otherwise(round((n * sxy - sx * sy) / sqrt(dxx * dyy), 6))
          .as("corr"))
  }

  /** Winsorized means per group: clip values at the EXACT ceil-rank
    * [pLo, pHi] percentiles (the q93/q138 integer-target convention) and
    * report the mean before and after — the robust-stats curation gate
    * that keeps one whale user or one 10^6-token document from dominating
    * a mixture weight or a metric readout.
    *
    * Both bounds come from [[selectRanksPerGroup]] (the grouped bucket
    * refinement — r8's "per-group rank window is sort-bound on hot
    * groups" caveat, retired); raw and clipped means are DECIMAL(18,6)
    * sums collapsed by one double division each, round-6. Output: (grp,
    * n, lo, hi, mean_raw, mean_winsorized). */
  def winsorizedMeans(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Int = 5, pHi: Int = 95): DataFrame = {
    require(pLo >= 1 && pHi <= 100 && pLo < pHi, "need 1 <= pLo < pHi <= 100")
    val rows = df.select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val counts = rows.groupBy("grp").agg(count(lit(1)).as("n"))
    val targets = counts
      .select(col("grp"), explode(array(
        struct(lit(0.0).as("tag"), expr(s"(n * $pLo + 99) div 100").as("k")),
        struct(lit(1.0).as("tag"), expr(s"(n * $pHi + 99) div 100").as("k")))).as("s"))
      .select(col("grp"), col("s.tag").as("tag"), col("s.k").as("k"))
    val bounds = selectRanksPerGroup(rows, targets, 1024)
      .groupBy("grp").agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    rows.join(broadcast(bounds), "grp")
      .withColumn("cv", least(greatest(col("v"), col("lo")), col("hi")))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        sum(col("v").cast("decimal(18,6)")).as("sv"),
        sum(col("cv").cast("decimal(18,6)")).as("scv"))
      .select(col("grp"), col("n"), col("lo"), col("hi"),
        round(col("sv").cast("double") / col("n").cast("double"), 6).as("mean_raw"),
        round(col("scv").cast("double") / col("n").cast("double"), 6)
          .as("mean_winsorized"))
  }

  /** Quantile normalization onto the GLOBAL distribution: replace each
    * value by the global quantile at its within-group percentile — the
    * distribution-alignment step that makes per-source scores comparable
    * before a mixture samples across sources (one source's "0.9 quality"
    * meaning another's "0.6" is the classic curation trap).
    *
    * The percentile is the midpoint rank (2·rn − 1)/(2n) under the total
    * order (value, id); the global target comes from the q75 mergeable
    * bucket histogram, linearly interpolated within the covering bucket.
    * Bucket selection is EXACT integer arithmetic — (2rn−1)·N vs
    * cum·2n cross-products — so no float boundary can put a row in two
    * buckets or none; only the final interpolation collapses to a
    * round-6 double.
    *
    * Scale shape: per-group ranks via [[bucketedRanksPerGroup]] (the
    * bucket refinement — no per-group sort, the former hot-group wall);
    * the histogram is one corpus-sized aggregate, its CDF a bucket-table
    * window (dimension-sized), broadcast back for the per-row bucket
    * lookup (bounded nested-loop: rows × buckets with buckets in the
    * hundreds by binWidth choice). Output: (id, group, v, pct, norm_v). */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val rows = df.select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("rid"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // per-group midpoint ranks via the grouped bucket refinement (same
    // (v, id) total order; n rides along) — no per-group sort windows
    val ranked = bucketedRanksPerGroup(rows, "v", Seq("rid"))
      .withColumnRenamed("rank", "rn")
    val hist = rows
      .groupBy(floor(col("v") / lit(binWidth)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val cdf = hist.withColumn("cum", sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.orderBy("bucket")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val total = rows.agg(count(lit(1)).as("bigN"))
    val joined = ranked.crossJoin(total).join(broadcast(cdf),
      (lit(2L) * col("rn") - 1L) * col("bigN") >=
        (col("cum") - col("cnt")) * lit(2L) * col("n") &&
      (lit(2L) * col("rn") - 1L) * col("bigN") <
        col("cum") * lit(2L) * col("n"))
    val frac = ((lit(2L) * col("rn") - 1L) * col("bigN")
      - (col("cum") - col("cnt")) * lit(2L) * col("n")).cast("double") /
      (col("cnt") * lit(2L) * col("n")).cast("double")
    joined.select(col("rid").as(idCol), col("grp").as(groupCol), col("v"),
      round((lit(2L) * col("rn") - 1L).cast("double")
        / (lit(2L) * col("n")).cast("double"), 6).as("pct"),
      round(lit(binWidth) * (col("bucket").cast("double") + frac), 6)
        .as("norm_v"))
  }
}
