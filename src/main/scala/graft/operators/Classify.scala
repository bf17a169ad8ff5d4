package graft.operators

import graft.functions.PortableHashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification over hashed unigram
  * features — the shape of every corpus-curation classifier (language
  * filters, quality gates, domain routers a la CCNet/fastText): train a
  * tiny model from labeled examples with two count aggregates, then score
  * the full corpus with a broadcast join. No driver-side learning loop,
  * no mutable state — the model IS a DataFrame of counts.
  *
  *   prior(c)      = ln(docs_c / N)
  *   p(slot | c)   = (count(c, slot) + 1) / (total_c + numSlots)   [add-one]
  *   score(d, c)   = prior(c) + sum_{tok in d} ln p(slot(tok) | c)
  *   predict(d)    = argmax_c score(d, c), ties by label ascending
  *
  * slot(tok) = poly_hash(tok) mod numSlots ([[PortableHashes.tokenSlot]]):
  * feature hashing bounds the model at classes x numSlots rows REGARDLESS
  * of corpus vocabulary, which is what makes the model broadcastable at
  * 100 TB (the DSIR generative model's contract, [[Selection]]).
  *
  * Scale shape: training is two word-count-family aggregates (per-(class,
  * slot) counts, per-class doc/token totals) — map-side partials, exchanges
  * bounded by classes x numSlots; the dense model table (every (class,
  * slot) pair via a sequence explode, absent counts smoothing to zero) is
  * classes x numSlots rows and broadcasts onto the corpus token rows;
  * inference's only corpus-sized exchange is the per-(doc, class) weight
  * aggregate — word-count-shaped with a constant classes fan-out; the
  * argmax window runs over `classes` rows per doc, never the corpus.
  *
  * Portability: each ln is rounded to 6 decimals and summed as
  * DECIMAL(38,6) (the LangModel contract), so scores — and therefore
  * argmax ranks — are reduction-order-independent: bit-reproducible under
  * any partitioning and by the DuckDB oracle mirror.
  */
object Classify {

  /** (doc_id, slot) rows of a space-tokenized text column. */
  private def slotRows(docs: DataFrame, textCol: String, numSlots: Int): DataFrame =
    docs.select(col("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .select(col("doc_id"),
        (PortableHashes.tokenSlot(col("tok")) % numSlots).as("slot"))

  /** Train the NB model from `labeled(doc_id, label, text)`.
    * Output — the dense model, (label, slot, lp, prior): one row for EVERY
    * (label, slot) pair (absent training counts add-one smooth to the
    * floor probability), lp/prior already ln'd and rounded to 6 decimals.
    * At most `labels x numSlots` rows: broadcastable by construction. */
  def trainNaiveBayes(labeled: DataFrame, numSlots: Int = 512,
      textCol: String = "text", labelCol: String = "label"): DataFrame = {
    val toks = labeled
      .select(col(labelCol).as("label"), explode(split(col(textCol), " ")).as("tok"))
      .select(col("label"), (PortableHashes.tokenSlot(col("tok")) % numSlots).as("slot"))
    val slotCounts = toks.groupBy("label", "slot").agg(count(lit(1)).as("ct"))
    val classTotals = toks.groupBy("label").agg(count(lit(1)).as("total"))
    val classDocs = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    // 1-row scalar: the training-corpus doc count (a catalog statistic)
    val nDocs = labeled.count()
    // dense (label, slot) grid so an unseen-in-training slot still scores
    // its smoothing floor instead of silently dropping out of the sum
    val grid = classTotals.join(classDocs, "label")
      .select(col("label"), col("total"), col("n_docs"),
        explode(sequence(lit(0L), lit(numSlots.toLong - 1))).as("slot"))
    grid.join(slotCounts, Seq("label", "slot"), "left")
      .select(col("label"), col("slot"),
        round(log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
          (col("total").cast("double") + lit(numSlots.toDouble))), 6).as("lp"),
        round(log(col("n_docs").cast("double") / lit(nDocs.toDouble)), 6).as("prior"))
  }

  /** Score + classify `docs(doc_id, text)` with a [[trainNaiveBayes]]
    * model. Output: (doc_id, pred, logp) — the argmax label (ties by label
    * ascending) and its posterior log-score. */
  /** Posterior log-score of EVERY (doc, label) pair under a
    * [[trainNaiveBayes]] model — the predict path's score table, exposed
    * for consumers that need more than the argmax (label-noise audits,
    * margin-based active-learning picks, calibration). */
  def naiveBayesScores(docs: DataFrame, model: DataFrame, numSlots: Int = 512,
      textCol: String = "text"): DataFrame = {
    val rt = slotRows(docs, textCol, numSlots)
    rt.join(broadcast(model), "slot")
      .groupBy("doc_id", "label")
      .agg(sum(col("lp").cast("decimal(38,6)")).as("s"),
        // prior is constant per label; min = that constant, kept through
        // the aggregate instead of a second model join
        min(col("prior")).as("prior"))
      .select(col("doc_id"), col("label"),
        (col("prior").cast("decimal(38,6)") + col("s")).cast("double").as("logp"))
  }

  def naiveBayesPredict(docs: DataFrame, model: DataFrame, numSlots: Int = 512,
      textCol: String = "text"): DataFrame = {
    val scores = naiveBayesScores(docs, model, numSlots, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("logp").desc, col("label").asc)
    scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("logp"))
  }

  /** Label-noise audit (confident-learning-lite; Northcutt et al.
    * JAIR'21): train the NB model on the corpus AS LABELED, score every
    * doc under every label, and surface the docs where the model
    * confidently disagrees with their given label — the review queue that
    * catches mislabeled sources, language tags, and quality strata before
    * they poison a mixture.
    *
    * margin = logp(argmax label) − logp(given label) ≥ 0; rows with
    * pred ≠ given are emitted, largest margin (most suspicious) first.
    * Same scale shape as [[naiveBayesEval]] — the scores table is the one
    * corpus-sized aggregate (doc × labels rows), the argmax window runs
    * over |labels| rows per doc, and the given-label score is a filter of
    * the same scores frame, co-partitioned on doc_id. Margin is a round-6
    * difference of the two DECIMAL-derived doubles. */
  def labelNoiseReport(labeled: DataFrame, numSlots: Int = 512,
      textCol: String = "text", labelCol: String = "label"): DataFrame = {
    val model = trainNaiveBayes(labeled, numSlots, textCol, labelCol)
    val scores = naiveBayesScores(
      labeled.select(col("doc_id"), col(textCol)), model, numSlots, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("logp").desc, col("label").asc)
    val best = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("logp").as("logp_pred"))
    val actual = labeled.select(col("doc_id"), col(labelCol).as("actual"))
    val own = scores.join(actual,
        scores("doc_id") === actual("doc_id") && col("label") === col("actual"))
      .select(scores("doc_id"), col("actual"), col("logp").as("logp_actual"))
    best.join(own, "doc_id")
      .filter(col("pred") =!= col("actual"))
      .select(col("doc_id"), col("actual"), col("pred"),
        col("logp_pred"), col("logp_actual"),
        round(col("logp_pred") - col("logp_actual"), 6).as("margin"))
  }

  /** Train on `train(doc_id, label, text)`, evaluate on
    * `test(doc_id, label, text)`: per-doc predictions with correctness.
    * Output: (doc_id, pred, actual, correct, logp). */
  def naiveBayesEval(train: DataFrame, test: DataFrame, numSlots: Int = 512,
      textCol: String = "text", labelCol: String = "label"): DataFrame = {
    val model = trainNaiveBayes(train, numSlots, textCol, labelCol)
    naiveBayesPredict(test.select(col("doc_id"), col(textCol)), model, numSlots, textCol)
      .join(test.select(col("doc_id"), col(labelCol).as("actual")), "doc_id")
      .select(col("doc_id"), col("pred"), col("actual"),
        (col("pred") === col("actual")).as("correct"), col("logp"))
  }

  /** Binary logistic regression over hashed binary unigram features,
    * trained by full-batch gradient descent expressed ENTIRELY as
    * DataFrame aggregates — the trainable complement to the closed-form
    * Naive Bayes above (q103): no driver-side weight vectors, no RDD
    * loops; the model is a (slot, w) table of dim+1 rows (slot −1 = bias,
    * present in every doc) that broadcast-joins the feature rows each
    * iteration.
    *
    * Per iteration (classic batch GD, e.g. Bishop PRML §4.3):
    *   margin_d = Σ_{slots of d} w_slot            (decimal sum)
    *   p_d      = round(1 / (1 + exp(−margin)), 6) (the round-6 libm rule)
    *   grad_s   = Σ_{docs containing s} (p_d − y_d)  (decimal sum)
    *   w'_s     = round(w_s − lr · grad_s / N, 9)
    * Every sum is a DECIMAL of round-6/9 terms, so the whole trajectory is
    * reduction-order-independent and the oracle replays all `iters`
    * iterations as an unrolled CTE chain bit-for-bit.
    *
    * Scale shape: the per-iteration work is ONE feature-row ⋈ broadcast
    * weight join + one per-doc aggregate + one per-slot aggregate (both
    * partial-combine map-side); the feature rows are materialized once
    * (eager checkpoint) and re-read each iteration — the at-rest design
    * shape of every multi-pass trainer. Iterations are a fixed, small
    * count by contract (full-batch GD on a broadcastable weight table).
    * Output: (slot, w), slot −1..dim−1, w the final round-9 weight. */
  def logisticTrain(docs: DataFrame, labelCol: String, dim: Int = 64,
      iters: Int = 3, lr: Double = 0.5, textCol: String = "text"): DataFrame = {
    require(dim >= 1 && iters >= 1 && lr > 0, "logisticTrain: bad hyperparams")
    val spark = docs.sparkSession
    graft.util.Checkpoints.ensureDir(spark)
    val lab = col(labelCol).cast("long")
    val toks = docs.select(col("doc_id"), lab.as("y"),
        explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .select(col("doc_id"), col("y"),
        (PortableHashes.tokenSlot(col("tok")) % dim).cast("long").as("slot"))
      .distinct()
    val withBias = toks.unionByName(
      docs.select(col("doc_id"), lab.as("y"), lit(-1L).as("slot")).distinct())
    val ds = withBias.checkpoint(eager = true)
    val n = docs.count() // 1-row scalar, the catalog-statistic analogue
    import spark.implicits._
    var w = (-1 until dim).map(s => (s.toLong, BigDecimal(0)))
      .toDF("slot", "w")
      .select(col("slot"), col("w").cast("decimal(28,9)").as("w"))
    for (_ <- 1 to iters) {
      val m = ds.join(broadcast(w), "slot")
        .groupBy("doc_id", "y")
        .agg(sum(col("w")).as("margin"))
      val p = m.select(col("doc_id"), col("y"),
        round(lit(1.0) / (lit(1.0) + exp(-col("margin").cast("double"))), 6)
          .as("p"))
      val g = ds.join(p.select(col("doc_id"), col("p"), col("y").as("y2")), "doc_id")
        .groupBy("slot")
        .agg(sum(round(col("p") - col("y2").cast("double"), 6)
          .cast("decimal(18,6)")).as("grad"))
      w = w.join(g, Seq("slot"), "left")
        .select(col("slot"),
          round(col("w").cast("double") -
            lit(lr) * (coalesce(col("grad"), lit(0).cast("decimal(18,6)"))
              .cast("double") / lit(n.toDouble)), 9)
            .cast("decimal(28,9)").as("w"))
    }
    w.select(col("slot"), col("w").cast("double").as("w"))
  }

  /** Calibration (reliability) report + Brier score of a [0,1] score
    * against a binary label — the probability-quality complement to
    * [[graft.operators.Stats.aucExact]]'s ranking quality (Brier 1950;
    * DeGroot & Fienberg 1983 reliability diagrams): a well-ranked but
    * mis-calibrated quality model over- or under-prunes whatever threshold
    * a curation pipeline picks.
    *
    * Per score decile (floor(score·10) capped at 9): observation count,
    * mean predicted score, observed positive rate — the reliability
    * diagram's points; plus the corpus-wide Brier score mean((s − y)²)
    * repeated per row (the woeReport output convention). |mean_pred −
    * obs_rate| per bucket IS the calibration gap.
    *
    * Arithmetic contract: scores/squared errors round to 9/12 decimals and
    * sum as DECIMALs (order-independent); one double division per output
    * column, round-6 — oracle-replayable under any partitioning. Scale
    * shape: ONE corpus-sized hash aggregate (map-side combine into ≤ 10
    * buckets); everything after is bucket-sized. */
  def calibrationReport(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val s = col(scoreCol).cast("double")
    val lab = col(labelCol).cast("long")
    val rows = df.select(s.as("s"), lab.as("lab"))
      .filter(col("s").isNotNull && col("lab").isNotNull)
      .withColumn("bucket", least(floor(col("s") * 10).cast("long"), lit(9L)))
    val perBucket = rows.groupBy("bucket").agg(
      count(lit(1)).as("n"),
      sum(round(col("s"), 9).cast("decimal(28,9)")).as("ssum"),
      sum(col("lab")).as("n_pos"),
      sum(round((col("s") - col("lab").cast("double"))
        * (col("s") - col("lab").cast("double")), 12).cast("decimal(38,12)"))
        .as("sqsum"))
    val overall = perBucket.agg(
      round(sum(col("sqsum")).cast("double")
        / sum(col("n")).cast("double"), 6).as("brier"))
    perBucket.crossJoin(overall)
      .select(col("bucket"), col("n"),
        round(col("ssum").cast("double") / col("n").cast("double"), 6)
          .as("mean_pred"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("obs_rate"),
        col("brier"))
  }

  /** Split-conformal prediction intervals per group (Vovk's inductive
    * conformal; Lei et al. JASA'18): calibrate a distribution-free
    * interval around a per-group mean predictor and report its EMPIRICAL
    * coverage on held-out rows — the "how wrong can this prediction be,
    * with guarantees" report that turns any point model into intervals.
    *
    *  - split: deterministic unit hash of the id (`u < calFrac`
    *    calibrates, the rest tests — no RNG, rerun-stable);
    *  - score: absolute residual |v − mean_cal(group)|, round-6;
    *  - q̂: the ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual (the
    *    finite-sample-valid conformal rank), picked EXACTLY by integer
    *    rank target — guarantees P(|v−m| ≤ q̂) ≥ 1−α on exchangeable data;
    *  - report: per-group interval half-width q̂ and observed test
    *    coverage (should sit at/above 1−α).
    *
    * Scale shape: means and counts are word-count-shaped aggregates; the
    * rank pick is a per-group window over calibration residuals — per-key
    * sort, spillable, hot groups are a sort problem not a heap problem
    * (the q138 bucket-refinement form is the swap-in when single groups
    * outgrow sort). Output: (grp, n_cal, n_test, mean_cal, qhat,
    * coverage), round-6 doubles. */
  def conformalReport(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, calFrac: Double = 0.5, alphaPct: Int = 10): DataFrame = {
    require(calFrac > 0 && calFrac < 1 && alphaPct >= 1 && alphaPct <= 50,
      "calFrac in (0,1), alphaPct in [1,50]")
    graft.util.Checkpoints.ensureDir(df.sparkSession)
    val rows = df.select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("cal",
        graft.operators.Sampling.unitHash(col("id")) < lit(calFrac))
    val calRows = rows.filter(col("cal"))
    val model = calRows.groupBy("grp")
      .agg(count(lit(1)).as("n_cal"),
        sum(col("v").cast("decimal(18,6)")).as("sv"))
      .select(col("grp"), col("n_cal"),
        round(col("sv").cast("double") / col("n_cal").cast("double"), 6)
          .as("mean_cal"))
      // conformal rank target: ceil((n_cal+1)(1-alpha)); clamp to n_cal
      // (tiny groups where the target exceeds the sample take the max)
      .withColumn("target",
        least(col("n_cal"),
          expr(s"((n_cal + 1) * ${100 - alphaPct} + 99) div 100")))
      // group-sized and consumed by three downstream stages — checkpoint
      // (recompute-per-consumer) and broadcast (a few-group corpus must
      // not hash-partition the residual passes onto |groups| tasks)
      .checkpoint(eager = true)
    val calRes = calRows.join(broadcast(model), "grp")
      .withColumn("r", round(abs(col("v") - col("mean_cal")), 6))
    // the conformal rank pick reads the residual VALUE at the target rank
    // — ties in r make the value well-defined whatever the id order, so
    // the grouped bucket-refinement selection replaces the per-group
    // (r, id) sort window exactly
    val qhat = Stats.selectRanksPerGroup(
        calRes.select(col("grp"), col("r").as("v")),
        model.select(col("grp"), lit(0.0).as("tag"),
          col("target").cast("long").as("k")), buckets = 1024)
      .select(col("grp"), col("value").as("qhat"))
      .checkpoint(eager = true) // ditto: derived through corpus-wide stages
    val test = rows.filter(!col("cal"))
      .join(broadcast(model), "grp").join(broadcast(qhat), "grp")
      .withColumn("covered",
        (round(abs(col("v") - col("mean_cal")), 6) <= col("qhat")).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_test"), sum(col("covered")).as("n_cov"))
    model.join(qhat, "grp").join(test, "grp")
      .select(col("grp"), col("n_cal"), col("n_test"), col("mean_cal"),
        col("qhat"),
        round(col("n_cov").cast("double") / col("n_test").cast("double"), 6)
          .as("coverage"))
  }

  /** Depth-1 decision tree ("stump") over bucketized numeric features —
    * the CART split search (Breiman et al. '84) expressed as one melt +
    * one aggregate + a bounded window: for every candidate feature, find
    * the threshold minimizing weighted Gini impurity of the binary split,
    * the primitive inside every boosted-tree / feature-screening loop.
    *
    * Candidate thresholds are the bucket boundaries `bucket·binWidth`
    * (the q75 histogram convention — `floor(v / binWidth)`, exact integer
    * bucketing both engines replay); the split "v < threshold" takes
    * buckets below b (values exactly on the boundary go right). Scale shape: the melt (one row per (row, feature)) is
    * narrow; per-(feature, bucket) label counts are ONE word-count-shaped
    * aggregate with map-side combine; the cumulative/Gini window runs over
    * ≤ buckets rows per feature, never the corpus.
    *
    * Gini arithmetic: counts are exact integers; each split's impurity is
    * ONE fixed-parenthesization double formula rounded to 6 —
    *   g(p) = 1 − p² − (1−p)²,  gini = (n_l·g_l + n_r·g_r)/n
    * Best split per feature by (gini asc, threshold asc) — deterministic.
    *
    * Output: (feature, threshold, gini, n_left, pos_left, n_right,
    * pos_right) — one row per feature; the caller's argmin over features
    * is a `rank=1` filter away. Degenerate splits (empty side) are
    * excluded; a feature with a single occupied bucket yields no row. */
  def decisionStump(df: DataFrame, labelCol: String,
      features: Seq[(String, Double)]): DataFrame = {
    require(features.nonEmpty && features.forall(_._2 > 0),
      "features must be non-empty with positive bin widths")
    val melted = df
      .select(col(labelCol).cast("long").as("y"),
        explode(array(features.map { case (f, w) =>
          struct(lit(f).as("feature"),
            floor(col(f).cast("double") / lit(w)).cast("long").as("bucket"))
        }: _*)).as("m"))
      .select(col("y"), col("m.feature").as("feature"), col("m.bucket").as("bucket"))
      .filter(col("y").isNotNull && col("bucket").isNotNull)
    val counts = melted.groupBy("feature", "bucket")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("feature").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val tot = counts.groupBy("feature")
      .agg(sum(col("n")).as("nt"), sum(col("pos")).as("post"))
    val widths = features.map { case (f, bw) =>
      struct(lit(f).as("feature"), lit(bw).as("bw"))
    }
    val wTab = df.sparkSession.range(1)
      .select(explode(array(widths: _*)).as("s"))
      .select(col("s.feature").as("feature"), col("s.bw").as("bw"))
    val splits = counts
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("posl", sum(col("pos")).over(w))
      .filter(col("nl").isNotNull) // first bucket: empty left side
      .join(tot, "feature").join(broadcast(wTab), "feature")
      .filter(col("nl") > 0 && col("nt") - col("nl") > 0)
    def gini(p: Column): Column = lit(1.0) - p * p - (lit(1.0) - p) * (lit(1.0) - p)
    val nl = col("nl").cast("double"); val nr = (col("nt") - col("nl")).cast("double")
    val pl = col("posl").cast("double") / nl
    val pr = (col("post") - col("posl")).cast("double") / nr
    val scored = splits
      .withColumn("threshold",
        round(col("bucket").cast("double") * col("bw"), 6))
      .withColumn("gini",
        round((nl * gini(pl) + nr * gini(pr)) / col("nt").cast("double"), 6))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy("feature").orderBy(col("gini").asc, col("threshold").asc)
    scored.withColumn("rn", row_number().over(rk)).filter(col("rn") === 1)
      .select(col("feature"), col("threshold"), col("gini"),
        col("nl").as("n_left"), col("posl").as("pos_left"),
        (col("nt") - col("nl")).as("n_right"),
        (col("post") - col("posl")).as("pos_right"))
  }
}
