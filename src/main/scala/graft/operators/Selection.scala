package graft.operators

import graft.functions.PortableHashes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Importance-resampling data selection (DSIR; Xie et al., NeurIPS 2023,
  * arXiv:2302.03169): score every document of a RAW corpus by how much more
  * likely its hashed-unigram features are under a small TARGET corpus (the
  * domain you want more of — wiki/books in the paper) than under the raw
  * corpus itself, then keep the highest-scoring k. The importance
  * log-weight of a document is the sum over its tokens of
  *
  *   log p_target(slot(tok)) - log p_raw(slot(tok))
  *
  * where slot(tok) hashes the token into `numSlots` buckets
  * ([[PortableHashes.tokenSlot]] mod numSlots — the paper's hashed n-gram
  * generative model, n=1) and each per-corpus distribution is add-one
  * smoothed over the slot space.
  *
  * Scale shape: both slot-count tables are at most `numSlots` rows — they
  * broadcast to the token rows regardless of corpus size — and the only
  * corpus-sized exchange is the per-doc weight aggregate (word-count
  * family, map-side partials). The two token totals are 1-row scalar
  * corpus constants (catalog statistics at scale). Selection is a bounded
  * top-k (TakeOrderedAndProject), never a global sort.
  *
  * Portability: each ln is rounded to 6 decimals and the per-doc sum runs
  * in DECIMAL(38,6) (LangModel's contract), so the weight is
  * reduction-order-independent — bit-reproducible under any partitioning
  * and by the DuckDB oracle mirror.
  */
object Selection {

  /** (doc_id, slot) rows of a space-tokenized text column. */
  private def slotRows(docs: DataFrame, textCol: String, numSlots: Int): DataFrame =
    docs.select(col("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .select(col("doc_id"),
        (PortableHashes.tokenSlot(col("tok")) % numSlots).as("slot"))

  /** Per-document importance log-weights of `raw` against `target`.
    * Output: (doc_id, n_toks, logw) — one row per raw document, logw the
    * exact DECIMAL(38,6) sum cast to double. Higher = more target-like. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      textCol: String = "text", numSlots: Int = 1024): DataFrame = {
    val rt = slotRows(raw, textCol, numSlots)
    val tt = slotRows(target, textCol, numSlots)
    // 1-row scalar corpus constants: the smoothing denominators
    val nT = tt.count()
    val nR = rt.count()
    val cT = tt.groupBy("slot").agg(count(lit(1)).as("ct"))
    val cR = rt.groupBy("slot").agg(count(lit(1)).as("cr"))
    // add-one smoothed per-slot log-ratio; each ln rounds to 6 decimals so
    // the decimal difference (and the per-doc sum below) is exact
    val lnT = round(log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
      lit(nT.toDouble + numSlots)), 6)
    val lnR = round(log((col("cr").cast("double") + lit(1.0)) /
      lit(nR.toDouble + numSlots)), 6)
    // every raw token's slot appears in cR by construction: the left join
    // against cT (slots unseen in target smooth to ct=0) keeps it complete
    val slotLr = cR.join(cT, Seq("slot"), "left")
      .select(col("slot"),
        (lnT.cast("decimal(38,6)") - lnR.cast("decimal(38,6)")).as("lr"))
    rt.join(slotLr, "slot")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("lr")).as("s"))
      .select(col("doc_id"), col("n_toks"), col("s").cast("double").as("logw"))
  }

  /** The k most target-like raw documents (ties broken by doc_id), ranked.
    * orderBy.limit compiles to TakeOrderedAndProject — k rows per partition
    * then a driver merge; the rank window runs over the k survivors only. */
  def importanceTopK(raw: DataFrame, target: DataFrame, k: Int,
      textCol: String = "text", numSlots: Int = 1024): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("logw").desc, col("doc_id"))
    importanceWeights(raw, target, textCol, numSlots)
      .orderBy(col("logw").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Prototypicality pruning (Sorscher, Geirhos, Shekhar, Ganguli, Morcos,
    * "Beyond neural scaling laws: beating power-law scaling via data
    * pruning", NeurIPS 2022, arXiv:2206.14486): score every example by
    * cosine to its cluster centroid — the paper's self-supervised
    * prototypes metric (high = prototypical/easy, low = hard) — and KEEP
    * only the `keepPerCluster` LEAST prototypical examples per cluster,
    * the paper's rule when data is abundant (pruning easy examples beats
    * random keeps and beats pruning hard ones). Clusters come from a
    * materialized IVF coarse quantizer at `indexPath`
    * ([[Similarity.writeIvfIndex]]'s centroid table — the k-means
    * prototypes), so the metric is replayable from stored doubles.
    *
    * Per-cluster (not global) keeps are load-bearing: a global
    * hardest-fraction cut would empty the tight clusters and keep only
    * outliers; the per-cluster cut preserves coverage of the space while
    * pruning each mode's redundant core.
    *
    * Scale shape: one broadcast centroid cross-join + per-row argmax
    * (the [[Similarity.assignToCentroids]] plan — the corpus never
    * shuffles for assignment), then the per-cluster cut through the
    * bounded-heap [[graft.plans.TopK.perKey]] execs — k rows per cluster
    * through partial aggregation, never a per-cluster sort. Assignment
    * tie-break (cos DESC, cid DESC) and keep tie-break (proto ASC,
    * vec_id ASC) are total orders over round-6 keys, so the kept set is
    * bit-stable across engines and partitionings.
    *
    * Output: (cid, vec_id, proto, rank) — kept rows only, rank 1 = the
    * cluster's hardest example.
    *
    * The centroid table is resolved through [[graft.util.Lsm.versionedRoot]]
    * — the same MVCC resolution every other IVF reader uses — so pointing
    * this at a daemon-maintained tree that has been retrained reads the
    * CURRENT quantizer, not the superseded legacy tables (which compaction
    * retires after the grace window). A fresh [[Similarity.writeIvfIndex]]
    * tree has no version dirs and resolves to itself. */
  def prototypicalityPrune(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, vecs: DataFrame,
      keepPerCluster: Int): DataFrame = {
    import graft.functions.ArrayMath
    val root = graft.util.Lsm.versionedRoot(
      graft.util.Lsm.fs(spark, indexPath), indexPath)
    val cents = spark.read.parquet(s"$root/centroids")
    val best = vecs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("cos", ArrayMath.cosineKey(col("embedding"), col("center")))
      .groupBy("vec_id")
      .agg(max(struct(col("cos"), col("cid"))).as("best"))
      .select(col("best.cid").as("cid"), col("vec_id"),
        col("best.cos").as("proto"))
    graft.plans.TopK.perKey(best, Seq(col("cid")),
        Seq(col("proto").asc, col("vec_id").asc), keepPerCluster)
      .select(col("cid"), col("vec_id"), col("proto"),
        col("rank").cast("long"))
  }
}
