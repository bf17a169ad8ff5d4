package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything derives from an arithmetic hash of the row id — no RNG state,
  * no seed plumbing, identical results on every engine, every partitioning,
  * and every rerun (the properties a 100 TB train/val/test split needs).
  *
  * Hash design (all constraints matter):
  *  - both 31-bit halves of the id feed the hash (lo XOR lcg(hi)), so ids
  *    beyond 2^31 do NOT alias — plain `id mod 2^31` would correlate row i
  *    with row i + 2^31 forever;
  *  - a `salt` selects independent hash streams: the sampling decision and
  *    the split assignment use different salts, otherwise every sampled row
  *    with u < fraction <= 0.8 would land in "train" (fully correlated);
  *  - every intermediate stays < 2^31 * 1103515245 < 2^63, so the identical
  *    formula runs in DuckDB (which traps BIGINT overflow) — see
  *    [[unitHashSql]], the oracle mirror. Ids must be non-negative.
  */
object Sampling {

  private val M = 2147483648L // 2^31
  private val Mask = M - 1

  private def lcg(x: Column): Column = (x * 1103515245L + 12345L) % M

  /** Uniform-ish u(id, salt) in [0, 1). */
  def unitHash(id: Column, salt: Int = 0): Column = {
    val lo = id.bitwiseAND(lit(Mask))
    val hi = shiftright(id, 31).bitwiseAND(lit(Mask))
    val mixed = (0 to salt).foldLeft(lo.bitwiseXOR(lcg(hi)))((h, _) => lcg(h))
    mixed.cast("double") / M.toDouble
  }

  /** SQL mirror of [[unitHash]] (DuckDB dialect) — keep textually parallel. */
  def unitHashSql(id: String, salt: Int = 0): String = {
    def lcgSql(x: String): String = s"((($x) * 1103515245 + 12345) % $M)"
    val lo = s"(($id) & $Mask)"
    val hi = s"(((($id) >> 31)) & $Mask)"
    val mixed = (0 to salt).foldLeft(s"xor($lo, ${lcgSql(hi)})")((h, _) => lcgSql(h))
    s"(CAST($mixed AS DOUBLE) / $M)"
  }

  /** Keep rows with u(id) < fraction. Deterministic Bernoulli sampling;
    * fractions nest (a 0.1 sample is a subset of a 0.3 sample). */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(unitHash(col(idCol)) < fraction)

  /** Stratified: per-stratum fraction looked up from `fractions`. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, f).otherwise(acc)
    }
    df.filter(unitHash(col(idCol)) < frac)
  }

  /** Deterministic per-group quota: keep the `quota` rows of each group with
    * the smallest (unitHash(id), id) key — reproducible source balancing for
    * training mixtures (cap every source at N docs). Output:
    * (groupCol, idCol, rank), rank 1..quota in selection order.
    *
    * Scale shape: the bounded-heap [[graft.functions.RowTopKAggregator]]
    * carries at most `quota` rows per group through partial aggregation
    * (map-side combine), so the shuffle moves quota rows per group instead
    * of the whole corpus — the window-function formulation
    * (`row_number() OVER (PARTITION BY group ORDER BY u)`) would sort every
    * row of every group and is kept only as the DuckDB oracle mirror. */
  def quotaPerGroup(df: DataFrame, groupCol: String, idCol: String,
      quota: Int): DataFrame = {
    import df.sparkSession.implicits._
    val ord: Ordering[(Double, Long)] = Ordering.Tuple2(
      Ordering.Double.TotalOrdering, Ordering.Long)
    df.select(col(groupCol).cast("string").as("g"),
        unitHash(col(idCol)).as("u"), col(idCol).cast("long").as("id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new graft.functions.RowTopKAggregator(quota, ord).toColumn)
      .toDF("g", "topk")
      .select(col("g").as(groupCol), posexplode(col("topk")))
      .select(col(groupCol), col("col._2").as(idCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Deterministic training-mixture draw: for each source named in
    * `weights`, keep its floor(weight * total) smallest-(unitHash, id) rows —
    * the absolute-count form of the "60% web / 30% code / 10% wiki" data
    * mixture every pretraining run specifies. Sources absent from `weights`
    * contribute nothing. Output: (groupCol, idCol, rank), rank 1..quota_g.
    *
    * Degenerate quotas are well-defined: a quota larger than a source keeps
    * the whole source, weight 0 drops it. Scale shape: identical to
    * [[quotaPerGroup]] — the bounded top-k aggregate carries max-quota rows
    * per source through partial aggregation, and `weights` is a tiny
    * driver-side literal (the mixture spec, not data). */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], total: Long): DataFrame = {
    require(weights.nonEmpty, "mixture weights must be non-empty")
    require(weights.values.forall(w => w >= 0.0 && !w.isNaN),
      s"mixture weights must be >= 0: $weights")
    // The epsilon keeps decimal weights on their mathematical floor: 0.29 *
    // 100 is 28.999999999999996 in binary doubles, and a bare floor would
    // silently under-fill that source by one row.
    val quotas = weights.map { case (g, w) =>
      g -> math.floor(w * total + 1e-9).toLong
    }
    // all-zero quotas degrade to an empty result through the k=0 aggregate
    val kMax = math.max(0L, math.min(quotas.values.max, Int.MaxValue.toLong)).toInt
    val inMix = df.filter(col(groupCol).isin(quotas.keys.toSeq: _*))
    val quotaOf = quotas.foldLeft(lit(0L)) { case (acc, (g, q)) =>
      when(col(groupCol) === g, lit(q)).otherwise(acc)
    }
    quotaPerGroup(inMix, groupCol, idCol, kMax)
      .filter(col("rank") <= quotaOf)
  }

  /** Weighted sampling without replacement, k rows per group (Efraimidis &
    * Spirakis A-ES, IPL 2006): each row draws key = u^(1/w) and the k
    * largest keys win — inclusion probability proportional to weight, no
    * replacement, single pass. Ranked here by the monotone-equivalent
    * ln(u)/w (descending), rounded to 12 decimals with id tie-break so the
    * ordering is stable across engines; u is nudged onto (0, 1] as
    * (hash+1)/2^31 — exact in IEEE, and ln(0) can never occur.
    *
    * The deterministic unit hash replaces the RNG: reruns, retries, and
    * repartitions all select the identical sample (the [[sample]]/
    * [[quotaPerGroup]] property, now weight-biased). Rows with w <= 0 or
    * null are excluded.
    *
    * Scale shape: identical to [[quotaPerGroup]] — the bounded top-k
    * aggregate carries at most k rows per group through map-side partial
    * aggregation; the full-sort window form is kept only as the oracle.
    * Output: (groupCol, idCol, weightCol, rank), rank 1..k. */
  def weightedPerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    // order by the (negated-key, id) head; the weight rides along as payload
    val ord: Ordering[((Double, Long), Double)] =
      Ordering.by[((Double, Long), Double), (Double, Long)](_._1)(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    val key = round(
      log(unitHash(col(idCol)) + lit(1.0 / M)) / col(weightCol).cast("double"), 12)
    df.filter(col(weightCol).isNotNull && col(weightCol).cast("double") > 0.0)
      .select(col(groupCol).cast("string").as("g"),
        (-key).as("negkey"), col(idCol).cast("long").as("id"),
        col(weightCol).cast("double").as("w"))
      .as[(String, Double, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => ((r._2, r._3), r._4))
      .agg(new graft.functions.RowTopKAggregator(k, ord).toColumn)
      .toDF("g", "topk")
      .select(col("g").as(groupCol), posexplode(col("topk")))
      .select(col(groupCol), col("col._1._2").as(idCol), col("col._2").as(weightCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Assign each row to a named split by cumulative weight thresholds, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Uses salt 1 — an
    * independent hash stream from [[sample]], so sampling then splitting
    * gives each stratum the full split mix. The last split absorbs any
    * floating residue. */
  def splitColumn(id: Column, splits: Seq[(String, Double)]): Column = {
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val u = unitHash(id, salt = 1)
    splits.zip(cum).dropRight(1).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(u < hi, name).otherwise(acc)
      }
  }

  /** Deterministic corpus shuffle + shard layout — the write-side last mile
    * of a training pipeline: every row gets a shard (hash-uniform over
    * `nShards`) and a position within its shard, ordered by an INDEPENDENT
    * salted hash stream so the within-shard order is a pseudo-random
    * permutation decorrelated from both the shard choice and ingest order.
    * No RNG anywhere (the sampling family's unit-hash contract): the same
    * corpus yields the same layout under any partitioning, so a re-run
    * after failure rewrites identical shards. Output: (idCol, shard, pos)
    * with pos dense from 1 per shard.
    *
    * Scale shape: the shard column is one narrow hash; the position is a
    * per-shard window sort — exactly the repartition(shard)
    * .sortWithinPartitions write path, nShards-way parallel, NO global
    * sort. Size nShards so corpus/nShards fits an executor's spillable
    * sort budget. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
      .orderBy(unitHash(col(idCol), salt = 1), col(idCol))
    df.select(col(idCol),
        floor(unitHash(col(idCol), salt = 0) * nShards).cast("long").as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Temperature-scaled mixture quotas — the multilingual "alpha-sampling"
    * rule (Conneau & Lample, NeurIPS 2019 §3.1; Xue et al., NAACL 2021
    * §3.2): a source holding empirical share p of the corpus gets sampling
    * weight p^alpha, renormalized across sources; alpha in (0,1) flattens
    * the distribution toward the tail sources (alpha=1 is proportional,
    * alpha=0 uniform). Returns one row per source with its row count, its
    * renormalized share, and its integer row quota out of `budget` — the
    * table [[mixtureSample]] consumes as its weight map.
    *
    * Determinism across engines: p^alpha and the renormalized share are
    * rounded to 6 decimals, the cross-source weight sum runs in
    * DECIMAL(38,6) (order-independent), and the quota floor carries the
    * same +1e-9 nudge as [[mixtureSample]] so decimal shares sit on their
    * mathematical floor. The common temperatures hit correctly-rounded
    * IEEE ops — alpha=0.5 is sqrt, alpha=1 is p itself, alpha=0 is 1 —
    * so those are BIT-identical on any engine; other alphas go through
    * pow, which libms only promise to ~1 ulp, leaving a negligible (but
    * nonzero) chance the 6-decimal round differs across engines.
    *
    * Scale shape: one count aggregate (map-side combinable) collapses the
    * corpus to a SOURCE-sized table; everything after — the total, the
    * weight sum, the renormalization — is arithmetic on that tiny frame
    * (two broadcast-able 1-row cross joins). Nothing source-count-shaped
    * ever re-touches the corpus.
    *
    * Output: (groupCol, n, share, quota) — quotas sum to <= budget. */
  def temperatureQuotas(df: DataFrame, groupCol: String, alpha: Double,
      budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    require(budget >= 0, s"budget must be non-negative: $budget")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__nn"))
    val p = col("n").cast("double") / col("__nn")
    val weight = alpha match {
      case 0.0 => lit(1.0)
      case 0.5 => sqrt(p)
      case 1.0 => p
      case a   => pow(p, a)
    }
    val weighted = counts.crossJoin(total).withColumn("__w",
      round(weight, 6).cast("decimal(38,6)"))
    val wsum = weighted.agg(sum("__w").as("__sw"))
    weighted.crossJoin(wsum)
      .withColumn("share",
        round(col("__w").cast("double") / col("__sw").cast("double"), 6))
      .select(col(groupCol), col("n"),  col("share"),
        floor(col("share") * budget + lit(1e-9)).cast("long").as("quota"))
  }

  /** Deterministic negative sampling — k pseudo-random negatives per anchor
    * for contrastive / ranking training pairs (the word2vec / DPR negative
    * draw; Mikolov NeurIPS'13 samples with RNG state, re-derived here as
    * pure hash arithmetic so reruns, retries and any partitioning produce
    * the SAME pairs).
    *
    * Construction: candidates land in `buckets` hash buckets; draw j of
    * anchor a addresses bucket B(a, j) and takes the candidate minimizing a
    * per-(anchor, draw) mix hash — an independent near-uniform pick per
    * draw, WITH replacement across draws (two draws of one anchor can
    * collide — the standard negative-sampling contract; callers needing
    * distinct negatives raise k and dedup). The anchor never draws itself.
    *
    * Scale shape: never a cross join — the draw table (anchors × k rows)
    * equi-joins candidates on the bucket key, and the per-draw argmin is a
    * min(struct) aggregate that partial-combines map-side, so the exchange
    * carries one row per (anchor, draw, partition). Join volume is
    * anchors × k × (candidates / buckets): `buckets` is the explicit
    * cost/uniformity knob (more buckets = cheaper joins, emptier buckets;
    * a draw addressing an empty bucket yields no row — sized so every
    * bucket is populated, candidates/buckets ≫ 1). All arithmetic is the
    * [[unitHash]] lcg family reduced mod 2^31 before every multiply, so the
    * identical formula runs in DuckDB. Output: (a_id, draw, neg_id). */
  def negativeSamples(anchors: DataFrame, candidates: DataFrame, k: Int,
      buckets: Int = 64, anchorIdCol: String = "a_id",
      candIdCol: String = "c_id"): DataFrame = {
    require(k >= 1, s"negativeSamples needs k >= 1, got $k")
    require(buckets >= 1, s"negativeSamples needs buckets >= 1, got $buckets")
    def mix31(id: Column): Column =
      id.bitwiseAND(lit(Mask)).bitwiseXOR(lcg(shiftright(id, 31).bitwiseAND(lit(Mask))))
    val cand = candidates.select(col(candIdCol).cast("long").as("c_id"),
      mix31(col(candIdCol)).as("hc"))
      .withColumn("bucket", lcg(col("hc")) % buckets)
    val draws = anchors.select(col(anchorIdCol).cast("long").as("a_id"),
        mix31(col(anchorIdCol)).as("ha"))
      .withColumn("draw", explode(sequence(lit(1), lit(k))))
      .withColumn("hj", (col("ha") * 131L + col("draw")) % M)
      .withColumn("bucket", lcg(col("hj")) % buckets)
    draws.join(cand, "bucket")
      .filter(col("c_id") =!= col("a_id"))
      .withColumn("score", lcg((col("hc") * 131L + col("hj")) % M))
      .groupBy("a_id", "draw")
      .agg(min(struct(col("score"), col("c_id"))).as("pick"))
      .select(col("a_id"), col("draw").cast("long").as("draw"),
        col("pick.c_id").as("neg_id"))
  }

  /** SQL mirror fragments of [[negativeSamples]] (DuckDB dialect) — keep
    * textually parallel. */
  def negMix31Sql(id: String): String = {
    def lcgSql(x: String): String = s"((($x) * 1103515245 + 12345) % $M)"
    s"xor((($id) & $Mask), ${lcgSql(s"((($id) >> 31)) & $Mask")})"
  }
  def negLcgSql(x: String): String = s"((($x) * 1103515245 + 12345) % $M)"

  /** Cumulative Poisson(1) probabilities P(X <= k), k = 0..6, as 12-decimal
    * literal STRINGS — shared verbatim by the Column builder and the SQL
    * oracle so both engines parse the identical IEEE doubles. */
  val PoissonCumLiterals: Seq[String] = {
    val e1 = BigDecimal(1) / BigDecimal(math.E, new java.math.MathContext(30))
    var fact = BigDecimal(1); var acc = BigDecimal(0)
    (0 to 6).map { k =>
      if (k > 0) fact *= k
      acc += e1 / fact
      acc.setScale(12, BigDecimal.RoundingMode.HALF_UP).toString + "e0"
    }
  }

  /** Poisson bootstrap confidence interval for the mean (Chamandy,
    * Muralidharan, Najmi & Naidu, "Estimating Uncertainty for Massive Data
    * Streams", Google TR 2012; Hanley & MacGibbon 2006): each replica b
    * re-weights every row by an independent Poisson(1) draw — the
    * at-scale bootstrap, because the draw is PER ROW, needs no global
    * resample pass, and here is pure hash arithmetic (the q125 mix
    * family), so replicas are deterministic and partition-invariant.
    *
    * Physical shape — the whole computation is ONE aggregate pass: every
    * replica contributes two aggregate columns (Σ w·x as a DECIMAL of
    * round-9 terms, Σ w as a long), so the exchange carries a single
    * 2·replicas-column row at any corpus size; no explode, no row
    * amplification. The CI is the [k+1, B−k] order statistics of the B
    * replica means (k = floor(alpha/2 · B)) — plain array math on one row.
    * `replicas` is the cost/precision knob (2 more aggregate columns
    * each). Intended for n ≫ replicas (a replica with zero total weight —
    * probability ~e^(−n) — would yield a null mean by construction).
    *
    * Output: one row (n, mean, ci_lo, ci_hi, replicas). */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
      replicas: Int = 24, alpha: Double = 0.1): DataFrame = {
    require(replicas >= 4 && replicas <= 64,
      s"bootstrapMeanCI: replicas in [4, 64], got $replicas")
    require(alpha > 0 && alpha < 1, s"bootstrapMeanCI: alpha in (0,1)")
    def mix31(id: Column): Column =
      id.bitwiseAND(lit(Mask)).bitwiseXOR(lcg(shiftright(id, 31).bitwiseAND(lit(Mask))))
    val hid = mix31(col(idCol).cast("long"))
    val x = col(valueCol).cast("double")
    def weight(b: Int): Column = {
      val u = lcg((hid * 131L + lit(b.toLong)) % M).cast("double") / M.toDouble
      PoissonCumLiterals.zipWithIndex.foldRight(lit(7L): Column) {
        case ((c, k), acc) => when(u < lit(c.toDouble), lit(k.toLong))
          .otherwise(acc)
      }
    }
    val aggs =
      Seq(count(lit(1)).as("n"),
        sum(round(x, 9).cast("decimal(28,9)")).as("sx")) ++
      (0 until replicas).flatMap { b =>
        Seq(sum(round(weight(b).cast("double") * x, 9).cast("decimal(28,9)"))
          .as(s"swx$b"),
          sum(weight(b)).as(s"sw$b"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val means = array((0 until replicas).map(b =>
      round(col(s"swx$b").cast("double") / col(s"sw$b").cast("double"), 6)): _*)
    val k = math.floor(alpha / 2 * replicas).toInt
    one.withColumn("__ms", sort_array(means))
      .select(col("n"),
        round(col("sx").cast("double") / col("n").cast("double"), 6).as("mean"),
        element_at(col("__ms"), k + 1).as("ci_lo"),
        element_at(col("__ms"), replicas - k).as("ci_hi"),
        lit(replicas.toLong).as("replicas"))
  }

  /** Leakage-safe train/valid/test split: the CLUSTER, not the document, is
    * the atomic split unit. A per-doc split (q49) lets two near-duplicates
    * land in train and test — the eval set then scores memorization, the
    * classic contamination failure (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022 measures exactly this
    * train/test dup leakage). Routing every member of a near-dup cluster on
    * ONE draw — `unitHash(rep_id)` — makes cross-split leakage structurally
    * impossible, whatever the cluster's size or skew.
    *
    * `clusters` is a (idCol, rep_id) labeling, e.g.
    * [[Dedup.connectedComponents]] over near-dup pairs; docs absent from it
    * (never paired) are their own singleton cluster (rep = own id). The
    * split thresholds compare the SAME u both engines compute — one exact
    * /2^31 division against plain double literals.
    *
    * Scale shape: one left join on the id (both sides id-keyed; the labels
    * table is cluster-membership-sized, typically ≪ corpus after dedup
    * gating) and a narrow per-row hash — no shuffle beyond the join, no
    * per-group state. Output: (idCol, rep_id, split). */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame,
      idCol: String = "doc_id", trainFrac: Double = 0.8,
      validFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && validFrac >= 0 && trainFrac + validFrac < 1,
      s"leakageSafeSplit: need 0 < trainFrac, 0 <= validFrac, sum < 1; " +
        s"got $trainFrac/$validFrac")
    val rep = clusters.select(col(idCol), col("rep_id").as("__rep"))
    val u = unitHash(col("rep_id"))
    docs.select(col(idCol)).join(rep, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__rep"), col(idCol)).as("rep_id"))
      .select(col(idCol), col("rep_id"),
        when(u < trainFrac, "train")
          .when(u < trainFrac + validFrac, "valid")
          .otherwise("test").as("split"))
  }

  /** Token-budget mixture plan: given target source WEIGHTS (the mixture
    * recipe) and a total token budget, report per source how many tokens
    * it must contribute and the implied EPOCH count — the
    * repetition-factor table every pretraining data card publishes
    * (epochs > 1 flags the under-resourced sources that will repeat;
    * epochs ≪ 1 flags sources being heavily subsampled). The analytic
    * companion to [[mixtureSample]]/[[temperatureQuotas]], which pick the
    * docs once the plan is accepted.
    *
    * One word-count-shaped aggregate (per-source doc + exact token
    * counts); weights broadcast; target = round(budget·w) integer,
    * epochs = round(target/tokens, 6). Output: (source, n_docs, tokens,
    * weight, target_tokens, epochs), listed sources only. */
  def tokenBudgetMixture(docs: DataFrame, sourceCol: String, textCol: String,
      weights: Seq[(String, Double)], budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty && budgetTokens > 0 &&
      math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "weights must be non-empty and sum to 1; budget positive")
    val totals = docs
      .select(col(sourceCol).cast("string").as("source"),
        size(split(col(textCol), " ")).cast("long").as("tk"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("tokens"))
    val wTab = docs.sparkSession.range(1)
      .select(explode(array(weights.map { case (s, w) =>
        struct(lit(s).as("source"), lit(w).as("weight"))
      }: _*)).as("s"))
      .select(col("s.source").as("source"), col("s.weight").as("weight"))
    totals.join(broadcast(wTab), "source")
      .withColumn("target_tokens",
        round(lit(budgetTokens.toDouble) * col("weight"), 0).cast("long"))
      .withColumn("epochs",
        round(col("target_tokens").cast("double") /
          col("tokens").cast("double"), 6))
  }

  /** Neyman-optimal stratified allocation (Neyman '34; Cochran §5.5): how
    * to spend a sampling budget across strata so the stratified mean's
    * variance is minimal — alloc_h ∝ N_h·σ_h, i.e. bigger AND noisier
    * strata get more budget. The design step in front of
    * [[quotaPerGroup]]: run this to get per-stratum quotas, then sample.
    *
    * One word-count-shaped aggregate (per-stratum n, Σv, Σv² as
    * DECIMAL(18,6) sums); σ and the weights evaluate on the strata-sized
    * table with fixed double formulas; shares round to 6 and the integer
    * allocation is round(budget·share) per stratum — deterministic, so
    * the SQL oracle replays it (the ±1 rounding drift vs an exact
    * largest-remainder apportionment is documented; callers needing
    * Σalloc == budget exactly post-adjust the largest stratum).
    * Single-value strata (σ = 0) get allocation 0 — one probe tells you
    * everything about a constant stratum. Output: (stratum, n, sd, share,
    * alloc). */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    def d6(c: Column): Column = c.cast("decimal(18,6)")
    val m = df.filter(col(valueCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n"), sum(d6(col(valueCol))).as("sv"),
        sum(d6(col(valueCol)) * d6(col(valueCol))).as("svv"))
      .filter(col("n") >= 2)
      .withColumn("sd", sqrt((col("svv").cast("double")
        - col("sv").cast("double") * col("sv").cast("double")
          / col("n").cast("double"))
        / (col("n").cast("double") - lit(1.0))))
      .withColumn("w", round(col("n").cast("double") * col("sd"), 6))
    val tot = m.agg(sum(col("w").cast("decimal(38,6)")).cast("double").as("tw"))
    m.crossJoin(tot)
      .filter(col("tw") > 0.0)
      .select(col("stratum"), col("n"), round(col("sd"), 6).as("sd"),
        round(col("w") / col("tw"), 6).as("share"),
        round(lit(budget.toDouble) * (col("w") / col("tw")), 0).cast("long")
          .as("alloc"))
  }
}
