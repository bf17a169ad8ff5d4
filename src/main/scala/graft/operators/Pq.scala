package graft.operators

import graft.functions.ArrayMath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, TPAMI 2011): the compressed
  * ANN representation. Each vector's `dim` dimensions split into `m`
  * subspaces of dim/m; each subspace gets its own `ksub`-centroid codebook
  * (Lloyd, like the IVF coarse quantizer but per-subspace); a vector is
  * stored as m small codes instead of dim floats — at rest m bytes/vector
  * versus 4·dim, a 32x compression at the common m=dim/8, ksub=256.
  *
  * Query scoring is ADC (asymmetric distance computation): the query stays
  * exact; per (subspace, centroid) partial dot products form an m×ksub
  * lookup table, and a candidate's approximate similarity is the SUM of its
  * m code lookups — O(m) per candidate after O(ksub·dim) per query, never
  * touching the original vectors. Scored here as approximate COSINE against
  * the reconstruction: cos(q, x̂) = Σs dot(q_s, c_s) / (|q|·sqrt(Σs |c_s|²))
  * — both sums over the same code lookups.
  *
  * Scale shape: the codebook table is m·ksub rows (KBs — broadcast); the
  * per-query partial table is queries×m×ksub (broadcast, bounded by the
  * small-query-set contract shared with the other top-k operators); the
  * corpus-sized side is the CODES table — the compressed form — which joins
  * the broadcast partials and partial-aggregates the m lookups map-side.
  * One corpus-sized shuffle of (q_id, vec_id) groups, each carrying two
  * decimals. Encode/train shapes match the IVF quantizer: broadcast
  * cross-join assignment + dim avg() aggregates.
  *
  * Bit-stability for the oracle: per-sub partials round to 12 decimals and
  * SUM as DECIMAL(38,12) — exact and order-independent under any partial
  * aggregation — then one double divide/round(6) ranking key with vec_id
  * tie-break; every per-sub dot is the same sequential fold DuckDB's
  * list_dot_product computes. Codes/codebooks are materialized parquet, so
  * the oracle replays encode-free ADC off the same stored doubles (the q42
  * IVF contract). Code rows are (vec_id, sub, code) longs for oracle
  * joinability; a production layout would pack them to a byte array per
  * vector — same information, same plan shape.
  */
object Pq {

  /** Per-subspace rows of the corpus: (vec_id, sub, subvec). */
  private def subVectors(corpus: DataFrame, m: Int, dim: Int): DataFrame = {
    val dsub = dim / m
    val emb = col("embedding").cast("array<double>")
    corpus.select(col("vec_id"), explode(array((0 until m).map(s =>
      struct(lit(s.toLong).as("sub"),
        slice(emb, s * dsub + 1, dsub).as("subvec"))): _*)).as("sv"))
      .select(col("vec_id"), col("sv.sub").as("sub"), col("sv.subvec").as("subvec"))
  }

  /** Train the m codebooks: ksub hash-ordered seed vectors (the same seed
    * sample sliced per subspace), refined by `iters` Lloyd steps — the
    * assignment is a broadcast cross-join + per-row argmin, the update is
    * dim/m codegen'd avg() aggregates per (sub, cid).
    * Output: (sub, cid, center: array<double>), m·ksub rows. */
  def pqCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
      dim: Int = 64, iters: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val dsub = dim / m
    val emb = col("embedding").cast("array<double>")
    val seeds = corpus.orderBy(xxhash64(col("vec_id"))).limit(ksub)
      .select(row_number().over(Window.orderBy(col("vec_id"))).cast("long").as("cid"),
        emb.as("emb"))
    val seedBooks = seeds.select(col("cid"), explode(array((0 until m).map(s =>
      struct(lit(s.toLong).as("sub"),
        slice(col("emb"), s * dsub + 1, dsub).as("center"))): _*)).as("sc"))
      .select(col("sc.sub").as("sub"), col("cid"), col("sc.center").as("center"))
    (0 until iters).foldLeft(seedBooks) { (books, _) =>
      val updated = assignCodes(corpus, books, m, dim)
        .join(subVectors(corpus, m, dim), Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("code").as("cid"))
        .agg(array((0 until dsub).map(i =>
          avg(element_at(col("subvec"), i + 1))): _*).as("center"))
      // Keep the codebook FULL at m·ksub rows: a centroid that captured no
      // vectors this step has no row in `updated` and would silently
      // vanish — left-join the update onto the previous book so an empty
      // cluster keeps its old center (standard Lloyd empty-cluster
      // handling; dropping it quietly degrades compression/recall on
      // skewed data or higher iters).
      books.select(col("sub"), col("cid"), col("center").as("prev_center"))
        .join(updated, Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"),
          coalesce(col("center"), col("prev_center")).as("center"))
    }
  }

  /** Encode: nearest sub-centroid per (vector, subspace) by squared L2,
    * expanded to (|x|² - 2·x·c) + |c|² so every term is the bit-verified
    * sequential-fold dot product; distance key rounded to 6 decimals with
    * cid tie-break, so the argmin is stable across engines.
    * Output: (vec_id, sub, code). */
  def assignCodes(corpus: DataFrame, codebooks: DataFrame, m: Int,
      dim: Int): DataFrame =
    subVectors(corpus, m, dim)
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("d2", round(
        (ArrayMath.dot(col("subvec"), col("subvec"))
          - lit(2.0) * ArrayMath.dot(col("subvec"), col("center")))
          + ArrayMath.dot(col("center"), col("center")), 6))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.cid").as("code"))

  /** Materialize the PQ index at rest: codebooks + the compressed codes
    * table. Codes are assigned against the WRITTEN codebooks (the
    * writeIvfIndex lesson: re-evaluating the live Lloyd plan could schedule
    * its avg() reductions differently and flip a boundary assignment). */
  def writePqIndex(corpus: DataFrame, path: String, m: Int = 8,
      ksub: Int = 16, dim: Int = 64): Unit = {
    pqCodebooks(corpus, m, ksub, dim).write.mode("overwrite")
      .parquet(s"$path/codebooks")
    val written = corpus.sparkSession.read.parquet(s"$path/codebooks")
    assignCodes(corpus, written, m, dim)
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Shared ADC core: per-(query, sub, centroid) partial table from the
    * broadcast codebooks, candidate scoring by decimal-summed code lookups,
    * cosine ranking key, top-k window. `joined` must already pair each
    * candidate code row (vec_id, sub, code) with its q_id. */
  private def adcPartials(qFrame: DataFrame, books: DataFrame, dsub: Int): DataFrame = {
    val qEmb = col("q_emb").cast("array<double>")
    qFrame.crossJoin(broadcast(books))
      .select(col("q_id"), col("sub"), col("cid").as("code"),
        round(ArrayMath.dot(
          slice(qEmb, col("sub").cast("int") * dsub + 1, lit(dsub)), col("center")), 12)
          .cast("decimal(38,12)").as("qpart"),
        round(ArrayMath.dot(col("center"), col("center")), 12)
          .cast("decimal(38,12)").as("cpart"))
  }

  private def adcRank(joined: DataFrame, qNorm: DataFrame, k: Int): DataFrame = {
    val scored = joined
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("qpart")).as("dots"), sum(col("cpart")).as("n2s"))
      .filter(col("q_id") =!= col("vec_id"))
      .join(broadcast(qNorm), Seq("q_id"))
      .withColumn("cos_pq", round(
        col("dots").cast("double") / (col("qnorm") * sqrt(col("n2s").cast("double"))), 6))
    // per-query cut through the heap execs (total order: vec_id tiebreak)
    graft.plans.TopK.perKey(scored, Seq(col("q_id")),
        Seq(col("cos_pq").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id"), col("cos_pq"), col("rank").cast("long"))
  }

  private def queryNorms(qFrame: DataFrame): DataFrame =
    qFrame.select(col("q_id"),
      sqrt(ArrayMath.dot(col("q_emb"), col("q_emb"))).as("qnorm"))

  /** Materialize the composed IVF-PQ index: the production ANN layout
    * (IVF coarse cells for pruning × PQ codes for compression — the FAISS
    * IVFPQ shape, Jégou TPAMI'11 §IV). At rest: centroids + codebooks
    * (both KB-sized) and the CODES table partitioned BY CELL — a probe
    * reads nprobe/nlist of the compressed corpus via directory-level
    * partition pruning and never touches a raw vector.
    *
    * `residual = true` (default) quantizes each vector's CELL RESIDUAL
    * x - c_cell(x) instead of x itself: residuals concentrate near the
    * origin regardless of which cell a vector landed in, so the m·ksub
    * codebook budget models the within-cell variation instead of
    * re-modelling the cell layout — strictly better codebook utilization
    * at the SAME plan shape (training, encode, and probe all keep their
    * join/aggregate structure; the probe adds two broadcast-sized lookup
    * terms). A `meta` table records the coding so the probe configures
    * itself from the index — a residual index can never be silently scored
    * as a raw one or vice versa. */
  /** Vector-side reconstruction norms |x̂|² for a codes frame under frozen
    * centroids + codebooks: |x̂|² = |c|² + 2·Σs dot(c_s, book_s[code]) +
    * Σs |book_s[code]|² is a pure function of (cell, codes) —
    * query-independent, so carrying it in the index (cid-partitioned like
    * the codes) removes two broadcast joins and three decimal aggregate
    * columns from EVERY probe. Decimal additions only (x + x, never 2·x)
    * keep the value exact and engine-portable; the probe casts to double
    * once, under the sqrt. Shared by the full build and the incremental
    * fold so both produce bit-identical rows for the same codes. */
  private def vnormRows(codesW: DataFrame, cents: DataFrame,
      books: DataFrame, dsub: Int): DataFrame = {
    val cn = cents.select(col("cid"),
      round(ArrayMath.dot(col("center"), col("center")), 12)
        .cast("decimal(38,12)").as("cn2"))
    val xt = cents.select(col("cid"), col("center"))
      .crossJoin(books.select(col("sub"), col("cid").as("code"),
        col("center").as("bc")))
      .select(col("cid"), col("sub"), col("code"),
        round(ArrayMath.dot(
          slice(col("center"), col("sub").cast("int") * dsub + 1, lit(dsub)),
          col("bc")), 12).cast("decimal(38,12)").as("xterm"))
    val bn = books.select(col("sub"), col("cid").as("code"),
      round(ArrayMath.dot(col("center"), col("center")), 12)
        .cast("decimal(38,12)").as("bpart"))
    codesW
      .join(broadcast(xt), Seq("cid", "sub", "code"))
      .join(broadcast(bn), Seq("sub", "code"))
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("xterm")).as("xsum"), sum(col("bpart")).as("rn2"))
      .join(broadcast(cn), "cid")
      .select(col("vec_id"), col("cid"),
        (col("cn2") + col("xsum") + col("xsum") + col("rn2")).as("rnorm2"))
  }

  /** The PQ encode input for a vector frame under a FROZEN cell
    * assignment: raw vectors, or their per-cell residuals x − c_cell.
    * Shared by the full build and the incremental fold. */
  private def pqEncodeInput(vecs: DataFrame, cells: DataFrame,
      cents: DataFrame, residual: Boolean): DataFrame =
    if (!residual) vecs.select(col("vec_id"), col("embedding"))
    else vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .join(cells, "vec_id")
      .join(broadcast(cents.select(col("cid"), col("center"))), "cid")
      .select(col("vec_id"),
        zip_with(col("emb"), col("center"), (x, c) => x - c).as("embedding"))

  /** Train + encode the four data tables (centroids, codebooks, codes,
    * vnorms) of an IVF-PQ tree under `root` — shared by the full build
    * ([[writeIvfPqIndex]], root = tree top) and the drift repair
    * ([[ivfPqRetrain]], root = a fresh MVCC version dir). Meta is NOT
    * written here: the build stamps params, the retrain carries the
    * existing meta (and its `last_batch`) unchanged. */
  private def writeIvfPqTables(corpus: DataFrame, root: String, nlist: Int,
      m: Int, ksub: Int, dim: Int, residual: Boolean): Unit = {
    val spark = corpus.sparkSession
    Similarity.ivfCentroids(corpus, nlist, dim).write.mode("overwrite")
      .parquet(s"$root/centroids")
    // assign against the WRITTEN tables (the writeIvfIndex lesson)
    val cents = spark.read.parquet(s"$root/centroids")
    val cells = Similarity.assignToCentroids(corpus, cents)
    val pqCorpus = pqEncodeInput(corpus, cells, cents, residual)
    pqCodebooks(pqCorpus, m, ksub, dim).write.mode("overwrite")
      .parquet(s"$root/codebooks")
    val books = spark.read.parquet(s"$root/codebooks")
    cells.join(assignCodes(pqCorpus, books, m, dim), Seq("vec_id"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$root/codes")
    if (residual) {
      vnormRows(spark.read.parquet(s"$root/codes"), cents, books, dim / m)
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$root/vnorms")
    }
  }

  def writeIvfPqIndex(corpus: DataFrame, path: String, nlist: Int = 16,
      m: Int = 8, ksub: Int = 16, dim: Int = 64,
      residual: Boolean = true): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    writeIvfPqTables(corpus, path, nlist, m, ksub, dim, residual)
    Seq((residual, nlist.toLong, m.toLong, ksub.toLong, dim.toLong))
      .toDF("residual", "nlist", "m", "ksub", "dim")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Resolve the root an IVF-PQ reader must use — the [[Similarity.ivfRoot]]
    * contract for the compressed twin: the highest committed MVCC version
    * dir ([[ivfPqRetrain]]'s publish unit), or `path` for a never-retrained
    * tree. The data tables (centroids/codebooks/codes/vnorms) live under
    * the resolved root; `meta` (params + `last_batch`) stays at the tree
    * top so the fold's idempotence survives a retrain. */
  def ivfPqRoot(spark: SparkSession, path: String): String =
    graft.util.Lsm.versionedRoot(graft.util.Lsm.fs(spark, path), path)

  /** Writer-entry recovery for an IVF-PQ tree: sweep a crashed retrain's
    * uncommitted version dirs, then the protocol-1 swaps of the top-level
    * tables. Every writer (fold, compaction, retrain) enters through this. */
  def recoverIvfPqTree(spark: SparkSession, path: String): Unit = {
    val fs = graft.util.Lsm.fs(spark, path)
    graft.util.Lsm.sweepUncommittedVersions(fs, path)
    Seq("centroids", "codebooks", "meta")
      .foreach(graft.util.Lsm.recoverSwap(fs, path, _))
  }

  /** Drift repair for the compressed twin — the escape hatch the fold
    * scaladoc names, wired: retrain the coarse quantizer AND the
    * sub-codebooks on `corpus` and re-encode every vector, publishing the
    * complete successor table set under a fresh MVCC version dir with one
    * atomic `_committed` marker-create ([[Similarity.ivfRetrain]]'s
    * protocol). Readers resolve [[ivfPqRoot]] once per query and are
    * snapshot-consistent; the superseded root keeps a grace window until
    * the next maintenance slot ([[ivfPqCompact]] retires it). Meta —
    * params and `last_batch` — is carried UNCHANGED, so a streaming retry
    * of a committed batch still no-ops after the retrain.
    *
    * `corpus` must be (vec_id, embedding) rows covering EVERYTHING the
    * tree serves — the caller owns that contract because the compressed
    * tree stores codes, not vectors. The natural source is the serving
    * (uncompressed) IVF twin's vector table, read AFTER both trees'
    * batch folds committed (the [[graft.streaming.EmbIngest]] retrain
    * slot does exactly this), at which point the two trees hold the same
    * vec_id set by the PQ-before-IVF fold order. Runs in the
    * single-writer maintenance slot.
    *
    * `nlistOverride` resizes the coarse quantizer at the retrain (the
    * [[Similarity.adaptiveNlist]] √n rule on a growing corpus); the
    * encode family (m/ksub/dim/residual) always carries from meta —
    * those DO pin code shape. When the override differs from the stored
    * nlist, meta is swap-updated (same fields + `last_batch`) AFTER the
    * version commit: a crash between the two leaves meta's nlist stale,
    * which is tolerated because no reader or fold keys on it — serving
    * and assignment read the centroid TABLE — and the next retrain or
    * fold meta-swap repairs the record. */
  def ivfPqRetrain(spark: SparkSession, path: String,
      corpus: DataFrame, nlistOverride: Option[Int] = None): Unit = {
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val fs = Lsm.fs(spark, path)
    recoverIvfPqTree(spark, path)
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val residual = meta.getAs[Boolean]("residual")
    val (metaNlist, m, ksub, dim) = (meta.getAs[Long]("nlist").toInt,
      meta.getAs[Long]("m").toInt, meta.getAs[Long]("ksub").toInt,
      meta.getAs[Long]("dim").toInt)
    val nlist = nlistOverride.getOrElse(metaNlist)
    val vecs = corpus.select(col("vec_id"), col("embedding"))
    if (vecs.isEmpty) return // nothing to train on; keep serving as-is
    val prev = Lsm.committedVersions(fs, path)
    val nextN = if (prev.isEmpty) 1 else prev.max + 1
    val next = s"$path/v$nextN"
    writeIvfPqTables(vecs, next, nlist, m, ksub, dim, residual)
    fs.create(new Path(s"$next/_committed")).close() // THE commit point
    if (nlist != metaNlist) {
      val lastBatch = if (meta.schema.fieldNames.contains("last_batch"))
        meta.getAs[Long]("last_batch") else -1L
      Seq((residual, nlist.toLong, m.toLong, ksub.toLong, dim.toLong,
          lastBatch))
        .toDF("residual", "nlist", "m", "ksub", "dim", "last_batch")
        .write.mode("overwrite")
        .parquet(Lsm.stagedPath(path, "meta", lastBatch))
      Lsm.commitSwap(fs, path, "meta", lastBatch)
    }
    Lsm.retireSupersededVersions(fs, path,
      Seq("centroids", "codebooks", "codes", "vnorms"), graceOne = true)
  }

  /** Fold NEW vectors into a materialized [[writeIvfPqIndex]] tree — the
    * compressed-index member of the warm-fold family
    * ([[Similarity.ivfInsert]] with PQ encoding): the batch assigns
    * against the FROZEN stored centroids, encodes against the FROZEN
    * stored codebooks (the FAISS `add` contract — codebook drift is the
    * documented cost, the escape hatch a full rebuild), and its code rows
    * (plus, for a residual index, their precomputed reconstruction norms —
    * the SAME [[vnormRows]] arithmetic as the build, so folded rows are
    * bit-identical to built rows) LSM-append into the cid= partitions
    * under [[graft.util.Lsm]] protocol 2. The meta swap (build params +
    * `last_batch`) commits LAST, so a retry no-ops on a committed id or
    * sweeps exactly its own partial move from BOTH bucket roots and
    * redoes the fold. [[ivfPqTopK]]/[[ivfPqTopKRefined]] serve the folded
    * tree unchanged. Batch vec_ids must be new — re-delivery is the
    * caller's id gate ([[graft.streaming.EmbIngest]]'s contract). */
  def ivfPqInsert(spark: SparkSession, path: String, batch: DataFrame,
      batchId: Long): Unit = {
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val fs = Lsm.fs(spark, path)
    recoverIvfPqTree(spark, path)
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val residual = meta.getAs[Boolean]("residual")
    val m = meta.getAs[Long]("m").toInt
    val dim = meta.getAs[Long]("dim").toInt
    // shared entry (committed no-op), then sweep this batch's partial
    // move from BOTH bucket roots at the RESOLVED version root (-1 = a
    // pre-incremental tree being adopted)
    if (Lsm.enterBatch(spark, fs, path, batchId).alreadyCommitted) return
    val root = ivfPqRoot(spark, path)
    val marker = s"b$batchId-"
    val codesRoot = new Path(s"$root/codes")
    val vnormsRoot = new Path(s"$root/vnorms")
    Seq(codesRoot, vnormsRoot).foreach(Lsm.sweepMarked(fs, _, marker))
    val staged = new Path(s"$path/staged")
    fs.delete(staged, true)
    val cents = spark.read.parquet(s"$root/centroids")
    val books = spark.read.parquet(s"$root/codebooks")
    val cells = Similarity.assignToCentroids(batch, cents)
    cells.join(assignCodes(pqEncodeInput(batch, cells, cents, residual),
        books, m, dim), Seq("vec_id"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$staged/codes")
    if (residual)
      vnormRows(spark.read.parquet(s"$staged/codes"), cents, books, dim / m)
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$staged/vnorms")
    Lsm.moveMarked(fs, new Path(s"$staged/codes"), codesRoot, marker)
    if (residual)
      Lsm.moveMarked(fs, new Path(s"$staged/vnorms"), vnormsRoot, marker)
    fs.delete(staged, true)
    Seq((residual, meta.getAs[Long]("nlist"), m.toLong,
        meta.getAs[Long]("ksub"), dim.toLong, batchId))
      .toDF("residual", "nlist", "m", "ksub", "dim", "last_batch")
      .write.mode("overwrite").parquet(Lsm.stagedPath(path, "meta", batchId))
    Lsm.commitSwap(fs, path, "meta", batchId)
  }

  /** One daemon batch against an at-rest IVF-PQ tree — the
    * [[graft.operators.Similarity.ivfCommitBatch]] contract for the
    * compressed twin: cold start (no stored tables yet) trains the coarse
    * quantizer, then the sub-codebooks, then writes the initial meta
    * (params + `last_batch = -1`), EACH committed by a protocol-1 swap
    * BEFORE any encoding — training is the non-deterministic plan in the
    * family (Lloyd's avg() reductions), so a retry either sees a
    * committed table (encodes identically) or no table (retrains;
    * nothing was encoded yet, by commit order — the meta marker that
    * makes codes servable commits last of all, inside the fold). Every
    * batch then folds through [[ivfPqInsert]]'s marked protocol.
    *
    * `trainOn` lets the caller train the quantizer on a wider frame than
    * it folds (the [[graft.streaming.EmbIngest]] daemon trains on the
    * whole deduplicated drop but folds only gate-admitted vectors).
    * A tree that already exists pins its build family: params must match. */
  def ivfPqCommitBatch(spark: SparkSession, path: String, batch: DataFrame,
      batchId: Long, nlist: Int = 16, m: Int = 8, ksub: Int = 16,
      dim: Int = 64, residual: Boolean = true,
      trainOn: Option[DataFrame] = None): Unit = {
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val fs = Lsm.fs(spark, path)
    val train = trainOn.getOrElse(batch)
    recoverIvfPqTree(spark, path)
    // cold-start existence checks at the RESOLVED root: a retrained tree
    // carries its tables in a version dir (the legacy top-level ones are
    // retired), and a bare $path check would re-trigger cold training
    val root = ivfPqRoot(spark, path)
    if (fs.exists(new Path(s"$path/meta"))) {
      val meta = spark.read.parquet(s"$path/meta").collect()(0)
      // the ENCODE family (m/ksub/dim/residual) pins code shape and must
      // match at every call; nlist is deliberately NOT pinned — it is the
      // coarse quantizer's size, which [[ivfPqRetrain]] may resize under
      // the adaptive √n rule while the caller still passes its configured
      // cold-start value (assignment reads the stored centroid table, so
      // a resized quantizer needs nothing from this parameter)
      require(meta.getAs[Boolean]("residual") == residual &&
        meta.getAs[Long]("m") == m &&
        meta.getAs[Long]("ksub") == ksub && meta.getAs[Long]("dim") == dim,
        s"IVF-PQ tree at $path was built with a different encode family " +
          s"(${meta.mkString(",")}); m/ksub/dim/residual must match at every call")
    }
    if (!fs.exists(new Path(s"$root/centroids"))) {
      Similarity.ivfCentroids(train, nlist, dim).write.mode("overwrite")
        .parquet(Lsm.stagedPath(path, "centroids", batchId))
      Lsm.commitSwap(fs, path, "centroids", batchId)
    }
    if (!fs.exists(new Path(s"$root/codebooks"))) {
      // train on the residuals the stored centroids imply (the
      // writeIvfPqIndex lesson: encode-time inputs must match train-time)
      val cents = spark.read.parquet(s"$root/centroids")
      val cells = Similarity.assignToCentroids(train, cents)
      pqCodebooks(pqEncodeInput(train, cells, cents, residual), m, ksub, dim)
        .write.mode("overwrite")
        .parquet(Lsm.stagedPath(path, "codebooks", batchId))
      Lsm.commitSwap(fs, path, "codebooks", batchId)
    }
    if (!fs.exists(new Path(s"$path/meta"))) {
      Seq((residual, nlist.toLong, m.toLong, ksub.toLong, dim.toLong, -1L))
        .toDF("residual", "nlist", "m", "ksub", "dim", "last_batch")
        .write.mode("overwrite").parquet(Lsm.stagedPath(path, "meta", batchId))
      Lsm.commitSwap(fs, path, "meta", batchId)
    }
    ivfPqInsert(spark, path, batch, batchId)
  }

  /** Compact an [[ivfPqInsert]]-grown tree: merge every cid= cell whose
    * LSM fragment count exceeds `maxFilesPerCell` back to one file — in
    * BOTH bucket roots (codes, and vnorms when the index is residual) —
    * under [[graft.util.Lsm.compactBuckets]]'s per-bucket staged swap,
    * with crashed-swap recovery and the above-last_batch orphan sweep at
    * entry. Content-preserving; runs in the single-writer slot. */
  def ivfPqCompact(spark: SparkSession, path: String,
      maxFilesPerCell: Int = 1): Unit = {
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    val fs = Lsm.fs(spark, path)
    recoverIvfPqTree(spark, path)
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val lastBatch =
      if (meta.schema.fieldNames.contains("last_batch"))
        meta.getAs[Long]("last_batch")
      else -1L
    val vroot = ivfPqRoot(spark, path)
    val roots = Seq(s"$vroot/codes") ++
      (if (meta.getAs[Boolean]("residual")) Seq(s"$vroot/vnorms") else Nil)
    for (r <- roots) {
      val root = new Path(r)
      if (fs.exists(root)) {
        val stagedRoot = new Path(s"${r}_compact_staged")
        val oldRoot = new Path(s"${r}_compact_old")
        Lsm.recoverBucketSwap(fs, root, stagedRoot, oldRoot)
        Lsm.sweepAboveBatch(fs, root, lastBatch)
        Lsm.compactBuckets(spark, fs, root, stagedRoot, oldRoot, "cid=",
          maxFilesPerCell)
      }
    }
    fs.delete(new Path(s"$path/staged"), true)
    // MVCC storage bound (the ivfCompact rule): a retrain-superseded
    // version had grace until this later single-writer slot — retire it
    Lsm.retireSupersededVersions(fs, path,
      Seq("centroids", "codebooks", "codes", "vnorms"), graceOne = false)
  }

  /** IVF-PQ top-k: probe the `nprobe` nearest cells per query (the q42
    * contract), then ADC-score ONLY those cells' codes. The scan of the
    * cid-partitioned codes table carries the probed-cell IN filter as
    * PartitionFilters (hand-rolled dynamic partition pruning, like
    * ivfTopKIndexed), so query cost is nprobe/nlist of the COMPRESSED
    * corpus. Recall < 1 from both stages (cells + codes), by contract.
    *
    * The coding is read from the index's `meta` table. For a residual index
    * the reconstruction is x̂ = c_cell + r̂, so
    * dot(q, x̂) = dot(q, c_cell) + Σs qpart; the reconstruction norm |x̂|²
    * is QUERY-INDEPENDENT and precomputed at build time into the index's
    * `vnorms` table (one decimal per vector, cid-partitioned — see
    * [[writeIvfPqIndex]]), so the residual probe keeps the non-residual
    * aggregate shape: one qcdot carry + one qpart sum per candidate, plus
    * a cell-pruned join against vnorms. Output: (q_id, vec_id, cos_pq,
    * rank). */
  def ivfPqTopK(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 4, m: Int = 8, dim: Int = 64): DataFrame = {
    val dsub = dim / m
    val meta = spark.read.parquet(s"$path/meta").head()
    require(meta.getAs[Long]("m") == m && meta.getAs[Long]("dim") == dim,
      s"index meta (m=${meta.getAs[Long]("m")}, dim=${meta.getAs[Long]("dim")}) " +
        s"disagrees with caller (m=$m, dim=$dim)")
    val residual = meta.getAs[Boolean]("residual")
    // snapshot isolation: resolve the version root ONCE and read every
    // table under it — a probe racing a retrain can never pair new
    // codebooks with old codes
    val vroot = ivfPqRoot(spark, path)
    val cents = spark.read.parquet(s"$vroot/centroids")
    val books = spark.read.parquet(s"$vroot/codebooks")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val qProbes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", ArrayMath.cosineKey(col("q_emb"), col("center")))
      .withColumn("pr", row_number().over(
        Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cid"),
        round(ArrayMath.dot(col("q_emb").cast("array<double>"), col("center")), 12)
          .cast("decimal(38,12)").as("qcdot"))
    // one evaluation feeds both the pushed partition filter and the join side
    val probeRows = qProbes.collect()
    val probed = probeRows.map(_.getLong(2)).distinct.sorted
    val qLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), qProbes.schema)
    val qDistinct = qLocal.select(col("q_id"), col("q_emb")).distinct()
    val partials = adcPartials(qDistinct, books, dsub)
    val codes = spark.read.parquet(s"$vroot/codes")
      .filter(col("cid").isin(probed: _*))
    if (!residual) {
      val joined = codes
        .join(broadcast(qLocal.select("q_id", "cid")), Seq("cid"))
        .join(broadcast(partials), Seq("q_id", "sub", "code"))
      adcRank(joined, queryNorms(qDistinct).distinct(), k)
    } else {
      // the vector-side reconstruction norm was precomputed at build (one
      // decimal per vector, cid-partitioned beside the codes) — the probe
      // scans it under the SAME pushed cell filter and the per-candidate
      // aggregate shrinks to the non-residual shape (one carry + one sum).
      // A residual index materialized BEFORE the vnorms precompute landed
      // has no such table — fail with the remedy, not a parquet path error
      require(new org.apache.hadoop.fs.Path(s"$vroot/vnorms")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(new org.apache.hadoop.fs.Path(s"$vroot/vnorms")),
        s"residual IVF-PQ index at $path predates the precomputed " +
          "reconstruction-norm table (vnorms/) — rebuild it with " +
          "writeIvfPqIndex to serve residual probes")
      val vn = spark.read.parquet(s"$vroot/vnorms")
        .filter(col("cid").isin(probed: _*))
        .select(col("vec_id"), col("rnorm2"))
      val joined = codes
        .join(broadcast(qLocal.select("q_id", "cid", "qcdot")), Seq("cid"))
        .join(broadcast(partials), Seq("q_id", "sub", "code"))
      // qcdot is constant within a (q_id, vec_id) group (one cell per
      // vector); max() is pure carry.
      val scored = joined
        .groupBy(col("q_id"), col("vec_id"))
        .agg(max(col("qcdot")).as("qcdot"), sum(col("qpart")).as("rdots"))
        .filter(col("q_id") =!= col("vec_id"))
        .join(vn, Seq("vec_id"))
        .join(broadcast(queryNorms(qDistinct).distinct()), Seq("q_id"))
        .withColumn("cos_pq", round(
          (col("qcdot").cast("double") + col("rdots").cast("double")) /
            (col("qnorm") * sqrt(col("rnorm2").cast("double"))), 6))
      graft.plans.TopK.perKey(scored, Seq(col("q_id")),
          Seq(col("cos_pq").desc, col("vec_id").asc), k)
        .select(col("q_id"), col("vec_id"), col("cos_pq"),
          col("rank").cast("long"))
    }
  }

  /** Two-stage (coarse-to-fine) search — the standard production serving
    * shape: [[ivfPqTopK]] prunes to `kCoarse` candidates per query reading
    * ONLY compressed codes, then just those candidates' raw vectors are
    * fetched and re-ranked by exact cosine. Output: (q_id, vec_id, cos,
    * rank), rank 1..k — `cos` is EXACT (the compression error never reaches
    * the returned scores, it only bounds which candidates are considered).
    *
    * Scale shape: the refine stage touches candidate-sized data — the
    * (q_id, vec_id) list (queries x kCoarse rows) broadcasts into one hash
    * join against the corpus, so the raw-vector fetch is a lookup, not a
    * scan-shuffle; queries broadcast for the exact scoring as in
    * bruteForceTopK. Recall is the coarse stage's (cells + codes, by
    * contract); precision of returned scores is 1 by construction. */
  def ivfPqTopKRefined(spark: SparkSession, path: String, queries: DataFrame,
      corpus: DataFrame, k: Int, kCoarse: Int = 50, nprobe: Int = 4,
      m: Int = 8, dim: Int = 64): DataFrame = {
    require(kCoarse >= k, s"kCoarse=$kCoarse must be >= k=$k")
    val cand = ivfPqTopK(spark, path, queries, kCoarse, nprobe, m, dim)
      .select(col("q_id"), col("vec_id"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        ArrayMath.cosineKey(col("q_emb"), col("embedding")).as("cos"))
    graft.plans.TopK.perKey(exact, Seq(col("q_id")),
        Seq(col("cos").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank").cast("long"))
  }

  /** ADC top-k over a materialized [[writePqIndex]] index: approximate
    * cosine from code lookups only — the original vectors are never read.
    * Output: (q_id, vec_id, cos_pq, rank), rank 1..k per query. */
  def pqTopKIndexed(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, m: Int = 8, dim: Int = 64): DataFrame = {
    val dsub = dim / m
    val books = spark.read.parquet(s"$path/codebooks")
    val codes = spark.read.parquet(s"$path/codes")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val joined = codes.join(broadcast(adcPartials(q, books, dsub)), Seq("sub", "code"))
    adcRank(joined, queryNorms(q), k)
  }

  /** Scalar (int8-range) quantization audit — the OTHER standard vector-
    * compression scheme next to PQ: per-dimension affine quantization onto
    * the 0..255 grid (`code = round((x − lo)/(hi − lo)·255)`), 4x smaller
    * than float32 at full dimensionality, no codebook training. This
    * reports, per dimension, the quantization parameters and the exact
    * reconstruction error the corpus would incur — the go/no-go gauge
    * before switching an ANN serving tier from float to SQ8.
    *
    * Scale shape: two word-count-shaped aggregates over the exploded
    * (row, dim) table — per-dim min/max, then per-dim error moments with
    * the dim-sized param table broadcast back on. Exchanges carry ≤ dim
    * rows per partition; nothing corpus-sized shuffles.
    *
    * Portability: lo/hi are exact input values (min/max — no rounding);
    * code and dequantized value are fixed-parenthesization double
    * formulas; per-dim MSE sums round-12 squared errors as
    * DECIMAL(38,12); max |err| is an order-independent max of round-9
    * values. A constant dimension (hi = lo) quantizes to code 0 and
    * reconstructs exactly.
    *
    * Output: (i, lo, hi, mse, max_err) — dim rows, mse round-9 (errors
    * live at 1e-5 scale for unit-range dims), max_err round-9. */
  def sq8Report(df: DataFrame, vecCol: String): DataFrame = {
    val rows = df.select(posexplode(col(vecCol).cast("array<double>"))
      .as(Seq("i", "x")))
    val params = rows.groupBy("i").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val code = when(col("hi") === col("lo"), lit(0L))
      .otherwise(round((col("x") - col("lo")) / (col("hi") - col("lo")) * 255.0, 0)
        .cast("long"))
    val dq = col("lo") + code.cast("double") / 255.0 * (col("hi") - col("lo"))
    val err = col("x") - dq
    rows.join(broadcast(params), "i")
      .select(col("i"), col("lo"), col("hi"),
        round(err * err, 12).cast("decimal(38,12)").as("e2"),
        round(abs(err), 9).as("ae"))
      .groupBy("i")
      .agg(min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        count(lit(1)).as("n"), sum(col("e2")).as("se2"), max(col("ae")).as("max_err"))
      .select(col("i").cast("long").as("i"), col("lo"), col("hi"),
        round(col("se2").cast("double") / col("n").cast("double"), 9).as("mse"),
        col("max_err"))
  }
}
