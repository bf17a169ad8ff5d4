package graft.operators

import graft.functions.PortableHashes
import org.apache.spark.sql.DataFrame
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
  def naiveBayesPredict(docs: DataFrame, model: DataFrame, numSlots: Int = 512,
      textCol: String = "text"): DataFrame = {
    val rt = slotRows(docs, textCol, numSlots)
    val scores = rt.join(broadcast(model), "slot")
      .groupBy("doc_id", "label")
      .agg(sum(col("lp").cast("decimal(38,6)")).as("s"),
        // prior is constant per label; min = that constant, kept through
        // the aggregate instead of a second model join
        min(col("prior")).as("prior"))
      .select(col("doc_id"), col("label"),
        (col("prior").cast("decimal(38,6)") + col("s")).cast("double").as("logp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("logp").desc, col("label").asc)
    scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("logp"))
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
}
