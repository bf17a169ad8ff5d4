package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus: BM25 scoring of a fixed
  * query-term set with a global top-k. The text-side counterpart of the
  * embedding ANN operators ([[Similarity]]) — a training-data pipeline uses
  * it for targeted corpus slicing ("pull the k docs most about X") and for
  * retrieval-based eval-set construction.
  *
  * Scale shape, by construction:
  *   - the query-term set is a literal IN-filter on the exploded token rows,
  *     so the corpus-wide term-frequency aggregate only ever shuffles rows
  *     matching the handful of query terms — everything else dies at the
  *     scan;
  *   - document lengths are a narrow per-doc aggregate over the same scan
  *     (no second pass over `text`);
  *   - corpus constants (N, total token count) are two scalars collected
  *     driver-side and folded into the scoring expression as plan-time
  *     literals — the 100 TB analogue is a catalog statistic, not a join.
  *     The oracle recomputes them in SQL with the same integer sum/count +
  *     one IEEE division, which is bit-identical to the driver-side fold;
  *   - per-term partial scores round to 6 decimals and sum as DECIMAL(38,6)
  *     (order-independent), so the score is bit-reproducible regardless of
  *     partitioning — and by the DuckDB oracle;
  *   - the global top-k is orderBy+limit = TakeOrderedAndProject: each
  *     partition keeps k candidates, the driver merges k*partitions rows.
  *     The rank window after it runs over k rows, not the corpus.
  */
object Retrieval {

  /** Okapi BM25 (Lucene's +1 idf form, always positive):
    * idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)
    * score(d) = sum_t idf(t) * (tf * (k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))
    * Output: (doc_id, score, rank) for the top `k` docs, ties broken by
    * doc_id. Operation ORDER is part of the contract — the oracle mirrors
    * this exact parenthesization so every IEEE step agrees bit-for-bit. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col(textCol), " ")).as("token"))
    // corpus constants, folded in as literals (catalog statistics at scale)
    val consts = docs
      .agg(count(lit(1)).as("n"), sum(size(split(col(textCol), " "))).as("sdl"))
      .collect()(0)
    val nDocs = consts.getLong(0)
    val avgdl = consts.getLong(1).toDouble / nDocs.toDouble
    val qToks = toks.filter(col("token").isin(terms: _*))
    val tf = qToks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = qToks.groupBy("token")
      .agg(count_distinct(col("doc_id")).as("df"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    scoreAndRank(tf.join(dfreq, "token").join(dl, "doc_id"),
      nDocs, avgdl, k1, b, k)
  }

  /** Shared BM25 scoring + ranking tail over (doc_id, tf, df, dl) rows.
    * One body for the from-scratch and index-served paths keeps every IEEE
    * step — and therefore the oracle hash — identical between them. */
  private def scoreAndRank(perTerm: DataFrame, nDocs: Long, avgdl: Double,
      k1: Double, b: Double, k: Int): DataFrame = {
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val dlD = col("dl").cast("double")
    val idf = log((lit(nDocs.toDouble) - dfD + lit(0.5)) / (dfD + lit(0.5))
      + lit(1.0))
    val denom = tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (dlD / lit(avgdl)))
    val termScore = round((idf * (tfD * lit(k1 + 1.0))) / denom, 6)
    val scored = perTerm
      .groupBy("doc_id")
      .agg(sum(termScore.cast("decimal(38,6)")).cast("double").as("score"))
    // ranked global top-k through the bounded-heap execs (map-side <= k
    // prune, one k-sized reducer heap) — ranks identical to the former
    // orderBy/limit + row_number pair under this total order
    graft.plans.TopK.global(scored,
        Seq(col("score").desc, col("doc_id").asc), k)
      .withColumn("rank", col("rank").cast("long"))
      .select("doc_id", "score", "rank")
  }

  /** Materialize the inverted index at rest: postings parquet-partitioned
    * by TOKEN BUCKET (tb=... directories, tb = poly_hash(token) mod
    * nBuckets) plus a one-row stats table. The text-side analogue of
    * [[Similarity.writeIvfIndex]] — the layout that makes retrieval at
    * 100 TB a directory-pruned read instead of a corpus re-scan per query
    * batch.
    *
    *   postings/tb=<B>/: (token, doc_id, tf, dl) — the doc length rides
    *     DENORMALIZED on every posting row (a Lucene norms-file analogue),
    *     so the probe never joins a corpus-sized doc-length table;
    *   stats/: one row (n_docs, sum_dl, n_buckets) — the corpus constants
    *     plus the bucketing arity, so an index is self-describing and can
    *     never be probed with the wrong bucket function arity.
    *
    * Build cost is two word-count-shaped aggregates over one tokenize pass
    * (tf per (doc, token), dl per doc) — no quadratic term, no window. */
  def writeInvertedIndex(docs: DataFrame, path: String, nBuckets: Int = 64,
      textCol: String = "text"): Unit = {
    val toks = docs.select(col("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val postings = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .withColumn("tb",
        pmod(graft.functions.PortableHashes.tokenSlot(col("token")),
          lit(nBuckets.toLong)))
    docs
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " "))).as("sum_dl"))
      .withColumn("n_buckets", lit(nBuckets.toLong))
      .withColumn("last_batch", lit(-1L)) // no incremental fold applied yet
      .write.mode("overwrite").parquet(s"$path/stats")
    postings.repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
  }

  /** Bootstrap an EMPTY inverted index: the stats row alone (n_docs = 0,
    * sum_dl = 0, last_batch = -1), no posting directories yet — the
    * daemon's cold-start target, so every document ever indexed flows
    * through the same [[invIndexInsert]] batch protocol (uniform
    * crash/retry semantics from batch 0 on). Serving starts after the
    * first fold lands postings; [[bm25TopKIndexed]] against a never-fed
    * index has no postings tree to read. */
  def initInvertedIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      nBuckets: Int = 64): Unit = {
    import spark.implicits._
    Seq((0L, 0L, nBuckets.toLong, -1L))
      .toDF("n_docs", "sum_dl", "n_buckets", "last_batch")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Fold a batch of NEW documents into a materialized
    * [[writeInvertedIndex]] index — the warm-fold family
    * ([[Graph.rankInsert]]/[[Graph.lpInsert]]) applied to retrieval: the
    * daemon path that keeps a served index fresh at batch cost, never
    * re-tokenizing the corpus.
    *
    * The batch tokenizes ALONE (batch-sized aggregates) and its posting
    * rows land in the existing tb=… directories — an LSM-style insert:
    * the base postings are never rewritten, each bucket directory just
    * gains batch files. The stats row then rewrites with the bumped
    * (n_docs, sum_dl). Write order is postings-then-stats: a reader that
    * races the fold sees the old constants with a few extra postings
    * (marginally stale idf/avgdl), never missing documents with inflated
    * constants. Batch doc_ids MUST be new — same-id re-ingest is an
    * upsert, which the CDC compactor handles upstream of the index (a
    * doc-keyed existence probe here would full-scan the token-partitioned
    * layout; the ingest cursor already guarantees newness).
    *
    * CRASH/RETRY SAFETY — the fold is a staged two-phase commit keyed by
    * `batchId` (unique per fold over the index's life; a streaming
    * sink's epoch id is the natural choice, single writer by contract):
    * the batch's postings first materialize under `$path/staged`, then
    * every data file renames into its tb= directory under a
    * batch-marked name (`b<id>-…`), then stats rewrites carrying
    * `last_batch = batchId`. A retry after ANY crash point is safe:
    * `last_batch == batchId` means the fold completed (no-op); otherwise
    * a recovery sweep deletes exactly this batch's marked files (the
    * partial move, if any) and the staged dir, then redoes the fold —
    * the double-append window of a naive read-modify-write is gone.
    *
    * The stats rewrite itself is ALSO atomic: the new row lands in
    * `$path/stats_staged_b<id>`, then two directory renames swap it in
    * (`stats`→`stats_old_b<id>`, staged→`stats`) and the old dir is
    * deleted. A crash between the renames leaves `stats` briefly absent —
    * but with the staged twin complete, so the entry-time recovery rolls
    * FORWARD (postings for the batch are already fully in place at that
    * point, making the staged stats the correct state); a Spark
    * `overwrite` here would instead delete-then-rewrite in place, and a
    * crash in that window silently zeroes n_docs/sum_dl over a full
    * postings tree on the next cold-looking start. */
  def invIndexInsert(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, batchId: Long, textCol: String = "text"): Unit = {
    import spark.implicits._
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    val fs = Lsm.fs(spark, path)
    // stats-swap recovery ([[graft.util.Lsm]] protocol 1): a crash between
    // the phase-2 renames of a prior fold leaves `stats` absent with a
    // completed staged twin (roll forward — that fold's postings were
    // already fully in place) or only the renamed-away old dir (roll
    // back — the interrupted fold then redoes cleanly below).
    Lsm.recoverSwap(fs, path, "stats")
    // shared entry (meta = the stats row): committed no-op, or sweep the
    // files a crashed attempt of THIS batch moved into place
    if (Lsm.enterBatch(spark, fs, path, batchId, metaDir = "stats",
        markedRoots = Seq("postings")).alreadyCommitted) return
    val stats = spark.read.parquet(s"$path/stats").collect()(0)
    val marker = s"b$batchId-"
    val postingsRoot = new Path(s"$path/postings")
    val staged = new Path(s"$path/staged")
    fs.delete(staged, true)
    val nBuckets = stats.getAs[Long]("n_buckets")
    val toks = batch.select(col("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .withColumn("tb",
        pmod(graft.functions.PortableHashes.tokenSlot(col("token")),
          lit(nBuckets)))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(staged.toString)
    // commit phase 1: move staged data files into their tb= dirs under
    // batch-marked names (per-file renames; any partial state is exactly
    // what the recovery sweep above identifies and removes)
    Lsm.moveMarked(fs, staged, postingsRoot, marker)
    fs.delete(staged, true)
    // commit phase 2: stats rewrite with the batch marker — staged write
    // plus the protocol-1 swap, never an in-place overwrite (see scaladoc)
    val b = batch
      .agg(count(lit(1)).as("bn"),
        coalesce(sum(size(split(col(textCol), " ")).cast("long")), lit(0L))
          .as("bdl"))
      .collect()(0)
    Seq((stats.getAs[Long]("n_docs") + b.getLong(0),
        stats.getAs[Long]("sum_dl") + b.getLong(1), nBuckets, batchId))
      .toDF("n_docs", "sum_dl", "n_buckets", "last_batch")
      .write.mode("overwrite").parquet(Lsm.stagedPath(path, "stats", batchId))
    Lsm.commitSwap(fs, path, "stats", batchId)
  }

  /** Compact an [[invIndexInsert]]-grown index: rewrite every tb= bucket
    * whose LSM fragment count exceeds `maxFilesPerBucket` into one fresh
    * file set, content-identical, under a per-bucket staged swap. The
    * daemon appends batch-marked files into the bucket dirs forever;
    * after thousands of batches the per-bucket file count is what
    * degrades probe scans (each file is an open+footer+seek), so
    * periodic compaction is the missing half of the LSM contract.
    *
    * CRASH/RETRY SAFETY — runs under the index's single-writer contract
    * (never concurrently with a fold):
    *   0. incomplete-fold sweep: any `b<id>-` file with id > the stats
    *      row's last_batch is a crashed fold's partial move. It MUST be
    *      removed before merging — compacted into an unmarked file it
    *      would escape the fold's own recovery sweep and double-append
    *      when that batch retries. The staged dir is swept with it.
    *   1. per bucket: rewrite to `compact_staged/tb=<B>`, then
    *      rename tb=<B> → `compact_old/tb=<B>` → rename staged in →
    *      delete old. A crash between the renames leaves the bucket
    *      recoverable from either twin (content-equal by construction);
    *      entry-time recovery rolls forward from staged when complete,
    *      else back from old — rerunning compaction afterwards is
    *      always safe because it is content-preserving.
    * Stats are untouched: compaction changes the file layout, never
    * n_docs/sum_dl/last_batch, so served BM25 scores are bit-identical
    * (the spec pins it). */
  def invIndexCompact(spark: org.apache.spark.sql.SparkSession, path: String,
      maxFilesPerBucket: Int = 1): Unit = {
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    val fs = Lsm.fs(spark, path)
    val postingsRoot = new Path(s"$path/postings")
    if (!fs.exists(postingsRoot)) return
    // bucket-swap recovery from a previous crashed compaction; both twin
    // roots live OUTSIDE postings/ so a reader's partition discovery never
    // sees a non-tb= directory mid-compaction
    val stagedRoot = new Path(s"$path/compact_staged")
    val oldRoot = new Path(s"$path/compact_old")
    Lsm.recoverBucketSwap(fs, postingsRoot, stagedRoot, oldRoot)
    // incomplete-fold sweep (step 0 above)
    val lastBatch = {
      val st = spark.read.parquet(s"$path/stats").collect()(0)
      if (st.schema.fieldNames.contains("last_batch"))
        st.getAs[Long]("last_batch") else -1L
    }
    Lsm.sweepAboveBatch(fs, postingsRoot, lastBatch)
    fs.delete(new Path(s"$path/staged"), true)
    Lsm.compactBuckets(spark, fs, postingsRoot, stagedRoot, oldRoot, "tb=",
      maxFilesPerBucket)
  }

  /** BM25 top-k served from a materialized [[writeInvertedIndex]] index:
    * the query terms' buckets are computed driver-side with the SAME
    * polynomial hash the writer used ([[graft.functions.expressions
    * .PolyHash.hash]] — plan-time arithmetic, not a data collect) and
    * pushed as an IN filter the reader turns into directory-level
    * PartitionFilters; corpus constants come from the one-row stats table.
    * The scan therefore touches |distinct term buckets| / nBuckets of the
    * postings — never the corpus — and df/tf/dl all come off the pruned
    * posting rows. Identical results to [[bm25TopK]] with equal parameters
    * (RetrievalSpec pins it; the scoring tail is literally shared). */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = spark.read.parquet(s"$path/stats").collect()(0)
    val nDocs = stats.getAs[Long]("n_docs")
    val avgdl = stats.getAs[Long]("sum_dl").toDouble / nDocs.toDouble
    val nBuckets = stats.getAs[Long]("n_buckets")
    val buckets = terms
      .map(t => graft.functions.expressions.PolyHash.hash(t) % nBuckets)
      .distinct.sorted
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(buckets: _*) && col("token").isin(terms: _*))
    // postings are one row per (doc, token), so count(*) per token == df
    val dfreq = postings.groupBy("token").agg(count(lit(1)).as("df"))
    scoreAndRank(postings.join(dfreq, "token"), nDocs, avgdl, k1, b, k)
  }

  /** Exact phrase occurrence counts — distributed grep for a phrase list:
    * banned-boilerplate screens, license/contamination probes, template
    * detection. `phrases` is one `phrase` column of space-joined tokens and
    * is broadcast by contract (screen lists are KBs against a corpus of
    * TBs). Output: (doc_id, phrase, n_hits), hits only.
    *
    * Scale shape: for each distinct phrase LENGTH, one narrow codegen pass
    * recomposes the per-doc sliding token windows (the q68 builder — no
    * positional self-join, no posting-list intersection), and the
    * broadcast equi-join on the window text discards every non-matching
    * window map-side. The only shuffle is the per-(doc, phrase) count over
    * MATCHING windows — hit-sized, not corpus-sized. The distinct lengths
    * come from one driver-side collect over the phrase table (bounded by
    * the broadcast contract — the q42 bounded-collect family). */
  def phraseHits(docs: DataFrame, phrases: DataFrame): DataFrame = {
    val pl = phrases.select(col("phrase")).distinct()
      .withColumn("len", size(split(col("phrase"), " ")))
    val lens = pl.select("len").distinct().collect().map(_.getInt(0)).sorted
    require(lens.nonEmpty && lens.head >= 1, "phrase list is empty")
    val toks = split(col("text"), " ")
    lens.map { n =>
      val wins = docs.select(col("doc_id"), explode(when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n), i =>
            concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
          .otherwise(array().cast("array<string>"))).as("win"))
      wins.join(broadcast(pl.filter(col("len") === n)),
          col("win") === col("phrase"))
        .select(col("doc_id"), col("phrase"))
    }.reduce(_.unionByName(_))
      .groupBy("doc_id", "phrase").agg(count(lit(1)).as("n_hits"))
  }

  /** The gate form: documents containing NONE of the phrases survive.
    * Anti-join against the hit-sized [[phraseHits]] doc set. NOTE the
    * keep-rule caveat (the q89 lesson): `docs` is referenced on both sides
    * of the anti-join, so checkpoint an expensive upstream pipeline before
    * gating it, or the gate re-runs it. */
  def phraseFilter(docs: DataFrame, phrases: DataFrame): DataFrame =
    docs.join(phraseHits(docs, phrases).select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * ranked lists — the standard hybrid-retrieval combiner (BM25 ⊕ ANN)
    * that needs no score calibration because it consumes only RANKS:
    *
    *   rrf(d) = Σ_lists 1 / (c + rank_list(d)),   c = 60 by convention.
    *
    * Each input is an (id, rank) frame (absent ids contribute nothing).
    * Per-contribution divisions are the identical IEEE op on both engines,
    * rounded to 9 decimals and summed as DECIMAL(18,9) — exact,
    * order-independent, oracle-replayable. Ties break by id.
    *
    * Scale shape: the inputs are top-k lists (bounded by construction), so
    * everything here is list-sized: one union, one hash aggregate, one
    * TakeOrderedAndProject. Output: (id, rrf, n_lists, rank), rank 1..k. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    require(k >= 1, s"rrfFuse needs k >= 1, got $k")
    val tagged = lists.map(_.select(col("id").cast("long").as("id"),
      round(lit(1.0) / (lit(c).cast("double") + col("rank").cast("double")), 9)
        .cast("decimal(18,9)").as("contrib")))
    val fused = tagged.reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum(col("contrib")).cast("double").as("rrf"),
        count(lit(1)).as("n_lists"))
    // ranked global top-k through the bounded-heap execs — same rows and
    // ranks as the former orderBy/limit + row_number pair (total order)
    graft.plans.TopK.global(fused, Seq(col("rrf").desc, col("id").asc), k)
      .withColumn("rank", col("rank").cast("long"))
      .select(col("id"), col("rrf"), col("n_lists"), col("rank"))
  }

  /** NDCG@k (Järvelin & Kekäläinen, TOIS 2002): grade a ranked result
    * list against graded relevance labels — the retrieval-eval yardstick
    * that q90's recall number can't express (recall treats rank 1 and
    * rank k the same; NDCG pays log-discounted attention to order).
    *
    * DCG = Σ_{pos ≤ k} (2^rel − 1)/log2(pos + 1) over the RESULT order;
    * IDCG = the same sum over the label set's own ideal order (rel desc,
    * item asc — the deterministic ideal). Each term is a round-6 double
    * summed as DECIMAL(38,6); ndcg = round(dcg/idcg, 6), 0 when the
    * query has no relevant item. Unlabeled result items are rel 0; label
    * items outside the results still count toward IDCG (missing a
    * relevant doc costs you, exactly as it should).
    *
    * Scale shape: one equi-join (results × labels on (qid, item)) + one
    * per-query rank window over the LABEL set (query-sized partitions)
    * + per-query aggregates. Input: results (qid, item, rank), labels
    * (qid, item, rel ≥ 0). Output: (qid, n_results, dcg, idcg, ndcg). */
  def ndcgAtK(results: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val res = results.select(col("qid"), col("item"),
      col("rank").cast("long").as("rank")).filter(col("rank") <= k)
    val lab = labels.select(col("qid"), col("item"),
      col("rel").cast("long").as("rel"))
    val gain: Column => Column = r =>
      pow(lit(2.0), r.cast("double")) - lit(1.0)
    val disc: Column => Column = p =>
      log(2.0, p.cast("double") + lit(1.0))
    val dcg = res.join(lab, Seq("qid", "item"), "left")
      .withColumn("g", round(gain(coalesce(col("rel"), lit(0L)))
        / disc(col("rank")), 6))
      .groupBy("qid").agg(count(lit(1)).as("n_results"),
        sum(col("g").cast("decimal(38,6)")).cast("double").as("dcg"))
    // per-qid ideal ranking through the heap execs: top-k by (rel desc,
    // item asc) per query, never a partition sort over the label set
    val idcg = graft.plans.TopK.perKey(lab, Seq(col("qid")),
        Seq(col("rel").desc, col("item").asc), k, rankCol = "pos")
      .withColumn("pos", col("pos").cast("long"))
      .withColumn("g", round(gain(col("rel")) / disc(col("pos")), 6))
      .groupBy("qid")
      .agg(sum(col("g").cast("decimal(38,6)")).cast("double").as("idcg"))
    dcg.join(idcg, Seq("qid"), "left")
      .select(col("qid"), col("n_results"), round(col("dcg"), 6).as("dcg"),
        round(coalesce(col("idcg"), lit(0.0)), 6).as("idcg"),
        when(coalesce(col("idcg"), lit(0.0)) > 0.0,
          round(col("dcg") / col("idcg"), 6)).otherwise(0.0).as("ndcg"))
  }
}
