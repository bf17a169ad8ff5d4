package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer as DATA: a trained merges table (rank, lhs,
  * rhs) stored as parquet, applied engine-side. This replaces regex token
  * approximations for the pipeline stages that key off real token budgets
  * (packing capacities, quota budgets, vocab accounting).
  *
  * Scale shape — the three stages have three different natural homes:
  *
  *  - COUNT (corpus-scale): one explode + groupBy shuffle builds the
  *    word-frequency dictionary. This is the only pass over the corpus.
  *  - TRAIN (vocabulary-scale): classic BPE training state is the frequency
  *    dictionary, not the corpus; capped at `maxVocab` entries it collects
  *    like a broadcast dimension and trains on the driver in milliseconds.
  *  - APPLY (vocabulary-scale compute, corpus-scale join): the sequential
  *    merge loop runs once per DISTINCT token with the merges map broadcast
  *    (this is the flatMapGroups/mapPartitions exception case: a data-
  *    dependent sequential fold no Catalyst expression expresses), and the
  *    corpus-scale path joins token -> piece count plus one aggregate — the
  *    corpus itself never carries per-character state. The join side is the
  *    DISTINCT-token dictionary, which unlike the `maxVocab`-capped training
  *    dict is unbounded (typos, URLs, numbers): at web-corpus scale it is
  *    billions of rows, so blindly broadcasting it is a driver/executor OOM.
  *    `subwordCounts` therefore size-gates the strategy with a one-pass
  *    `approx_count_distinct` probe (partial HLL sketches, map-side
  *    combined — a narrow scan, no wide shuffle): dictionaries under
  *    `maxBroadcastTokens` get the broadcast hint, larger ones fall back to
  *    a plain shuffle join on `token` (the explode side already pays its
  *    shuffle for the groupBy, so the extra exchange is the dictionary's
  *    only cost). Both paths produce identical rows.
  */
object Bpe {

  /** Word-frequency dictionary: the single corpus-scale shuffle. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** Deterministic classic BPE over a word-frequency dictionary: each round
    * merges the most frequent adjacent symbol pair (count desc, then
    * (lhs, rhs) asc so ties never depend on hash order), weighted by word
    * frequency. Stops early when no pair remains. */
  def trainMerges(dict: Seq[(String, Long)],
      numMerges: Int): Seq[(Int, String, String)] = {
    var vocab = dict.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String)]()
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (lhs, rhs) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += ((rank, lhs, rhs))
        vocab = vocab.map { case (syms, c) => (mergeAll(syms, lhs, rhs), c) }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Batch merge of every left-to-right non-overlapping (lhs, rhs)
    * occurrence — the training-side rewrite step. */
  private def mergeAll(syms: Vector[String], lhs: String,
      rhs: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == lhs && syms(i + 1) == rhs) {
        b += lhs + rhs; i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Apply a merges table to one token: repeatedly merge the LEFTMOST
    * occurrence of the LOWEST-RANK applicable pair, one occurrence per
    * step. For a table produced by BPE training this equals the standard
    * replace-all-occurrences application (any pair involving a derived
    * symbol always ranks above the merge that created the symbol), and the
    * one-at-a-time form is what the DuckDB oracle replays verbatim as a
    * recursive CTE — both engines run the identical algorithm. */
  def encode(token: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = token.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        syms = (syms.take(bestI) :+ (syms(bestI) + syms(bestI + 1))) ++
          syms.drop(bestI + 2)
        done = syms.length < 2
      }
    }
    syms
  }

  /** COUNT + TRAIN: dictionary capped at `maxVocab` by (count desc, token
    * asc) — the cap bounds driver memory like a broadcast-size threshold;
    * words outside the cap still encode at apply time (their characters and
    * whatever trained merges apply). */
  def fitMerges(docs: DataFrame, numMerges: Int = 200, maxVocab: Int = 10000,
      textCol: String = "text"): Seq[(Int, String, String)] = {
    val dict = wordCounts(docs, textCol)
      .orderBy(col("n").desc, col("token").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainMerges(dict, numMerges)
  }

  /** The merges table at rest (tiny: one row per merge). */
  def writeMerges(spark: SparkSession, merges: Seq[(Int, String, String)],
      path: String): Unit = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** APPLY: per-document token and subword counts under a merges table.
    * Output: (doc_id, n_tokens, n_subwords).
    *
    * `maxBroadcastTokens` is the size gate for the token->piece-count
    * dictionary join (see the class scaladoc): estimated distinct-token
    * counts at or under it take the broadcast-hash path, anything larger a
    * shuffle join on `token`. 0 forces the shuffle path (used by the scale
    * probe), `Long.MaxValue` forces broadcast. The default keeps the
    * dictionary comfortably under Spark's broadcast limits at ~tens of MB.
    *
    * `distinctTokens`: caller-supplied distinct-token cardinality. The
    * default (-1 = unknown) runs a one-pass approx_count_distinct probe,
    * which tokenizes the corpus an extra time before the real apply — fine
    * for one-shot jobs, wasteful for a steady-state daemon applying the
    * same merges per batch. A daemon that tracks its dictionary size (or
    * knows its batch bound) passes the estimate and skips the probe job
    * entirely. */
  def subwordCounts(docs: DataFrame, merges: Seq[(Int, String, String)],
      textCol: String = "text",
      maxBroadcastTokens: Long = 1000000L,
      distinctTokens: Long = -1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.map { case (r, l, h) => (l, h) -> r }.toMap)
    val toks = docs.select(col("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val pieceCounts = toks.select("token").distinct().as[String]
      .mapPartitions { it =>
        val m = ranksB.value
        it.map(t => (t, encode(t, m).length.toLong))
      }.toDF("token", "n_pieces")
    // Narrow one-pass cardinality probe: partial HLL per scan task, tiny
    // combine — never materializes the distinct set on the driver. Skipped
    // when the caller supplied the cardinality or a forced strategy.
    val estDistinct =
      if (distinctTokens >= 0L) distinctTokens
      else if (maxBroadcastTokens == 0L || maxBroadcastTokens == Long.MaxValue) 0L
      else toks.agg(approx_count_distinct("token")).first().getLong(0)
    val dict =
      if (maxBroadcastTokens != 0L &&
          (maxBroadcastTokens == Long.MaxValue || estDistinct <= maxBroadcastTokens))
        broadcast(pieceCounts)
      else pieceCounts
    toks.join(dict, "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("n_pieces").as("n_subwords"))
  }
}
