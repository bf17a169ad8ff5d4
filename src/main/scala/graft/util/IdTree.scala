package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed admitted-id sidecar — the structure that bounds the
  * re-delivery gate's POSITIVE-verification scan (VERDICT r13 top ask).
  *
  * The [[BloomSidecar]] makes the all-novel case free, but any bloom
  * positive (a true re-delivery or an fpp hit — at a steady ~10%
  * re-delivery mix, every batch) previously verified against
  * `distinct(full stored id column)`: an O(corpus) aggregate per batch,
  * the one measured growing gate curve in the r13 soak (gate_redelivery
  * 0.84 → 1.54 s Q1→Q4; at 10⁹ ids it is a corpus-sized scan every
  * 30 s). The daemon trees' own buckets are keyed by content (cid/tb of
  * band hashes), so nothing prunes an ID probe.
  *
  * This sidecar stores exactly the admitted id set ONE MORE TIME, keyed
  * the way the probe needs: `<tree>/ids/tb=<hash(id) % B>/` parquet
  * buckets of a single long `id` column. [[verify]] computes the
  * positives' buckets (≤ B distinct longs — driver-bounded by
  * construction, never data-sized), pushes them as an IN filter the
  * reader turns into PartitionFilters, and semi-joins positives against
  * ONLY those buckets: per-batch verify cost is
  * O(#positive-buckets × corpus/B) instead of O(corpus), and B is fixed
  * at tree creation (`ids_meta`), so the operator picks the prune factor.
  * Storage cost: 8 bytes/id + parquet overhead — noise next to any tree.
  *
  * Crash/retry — [[Lsm]] protocol 2, riding the OWNING tree's batch
  * protocol (this sidecar has no commit marker of its own):
  *   - folds land as `b<batchId>-` marked files ([[Lsm.moveMarked]]);
  *   - the owning daemon sweeps this batch's own marker at entry
  *     ([[enterBatch]]) exactly as it sweeps its data tree, so a retried
  *     batch's [[verify]] sees only ids admitted by EARLIER batches;
  *   - the fold MUST run before the owning tree's commit marker (the
  *     meta swap / checkpoint): a committed batch whose ids never folded
  *     would be invisible here forever — false novelty, duplicate
  *     admission. Fold-before-commit + sweep-at-entry make the set exact
  *     at every gate evaluation.
  *   - [[compact]] merges per-bucket fragments in the maintenance slot
  *     ([[Lsm.compactBuckets]] one-job staging); `lastBatch` must be a
  *     COMMITTED batch id ([[Lsm.sweepAboveBatch]] deletes marked files
  *     above it — the owning daemon passes its meta's committed id, or
  *     `batchId - 1` when compacting at entry before its own fold, the
  *     [[graft.streaming.DocIngest]] pattern whose tree has no meta).
  *
  * Single-writer-slot only (every method can mutate via entry recovery);
  * a legacy tree without the sidecar keeps the full-scan verify and
  * adopts it at the next fold ([[fold]] bootstraps from `storedIds` —
  * one O(corpus) pass, the adoption price the BloomSidecar also paid).
  */
object IdTree {

  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  /** Pinned read schema (id + the tb partition column): the sidecar's
    * layout is fixed, so every read skips footer-sampling schema
    * inference — one less whole-tree touch per verify, and the partition
    * pruning contract holds even at planning time. */
  private val idSchema = StructType(Seq(
    StructField("id", LongType), StructField("tb", LongType)))

  private def dir(treePath: String) = s"$treePath/ids"
  private def metaDir(treePath: String) = s"$treePath/ids_meta"
  private def stageRoot(treePath: String) = new Path(s"$treePath/ids_stage")
  private def compactStaged(treePath: String) =
    new Path(s"$treePath/ids_compact_staged")
  private def compactOld(treePath: String) =
    new Path(s"$treePath/ids_compact_old")

  /** The bucket an id hashes to — the SAME expression at fold and verify
    * time (B is pinned in `ids_meta` so the two can never disagree). */
  def bucketOf(id: org.apache.spark.sql.Column,
      nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(id.cast("long")), lit(nBuckets.toLong))

  /** Entry recovery + this batch's own-marker sweep — the owning
    * daemon calls this at writer entry for an UNCOMMITTED batch, before
    * any gate probes the sidecar (mirrors its data-tree sweep). */
  def enterBatch(spark: SparkSession, treePath: String, batchId: Long): Unit = {
    val fs = Lsm.fs(spark, treePath)
    recover(fs, treePath)
    Lsm.sweepMarked(fs, new Path(dir(treePath)), s"b$batchId-")
  }

  /** Roll forward/back a crashed meta swap and a crashed [[compact]]'s
    * bucket swap. Mutating (protocol recovery) — single-writer slot. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem,
      treePath: String): Unit = {
    Lsm.recoverSwap(fs, treePath, "ids_meta")
    Lsm.recoverBucketSwap(fs, new Path(dir(treePath)),
      compactStaged(treePath), compactOld(treePath))
  }

  /** True iff the sidecar holds data (the gate's dispatch probe —
    * DATA files, not dir existence: a swept crashed bootstrap leaves
    * empty tb= dirs behind). */
  def exists(spark: SparkSession, treePath: String): Boolean =
    Lsm.hasBucketData(Lsm.fs(spark, treePath), new Path(dir(treePath)))

  private def nBucketsOf(spark: SparkSession, treePath: String): Int =
    spark.read.parquet(metaDir(treePath)).collect()(0)
      .getAs[Long]("n_buckets").toInt

  /** The sidecar's full id frame (one `idCol` column) — the cheap source
    * for maintenance-slot full-set consumers ([[BloomSidecar.rebuild]]):
    * single column, compacted buckets, vs the owning tree's wider rows. */
  def readAll(spark: SparkSession, treePath: String,
      idCol: String): DataFrame =
    spark.read.schema(idSchema).parquet(dir(treePath))
      .select(col("id").as(idCol))

  /** The subset of `positives` already stored — the bounded verify.
    * Reads ONLY the buckets the positives hash to: the bucket list is
    * collected (≤ B longs, never data-sized) and pushed as an IN filter
    * on the partition column, so the scan is partition-pruned to
    * #positive-buckets/B of the sidecar. Caller must have run
    * [[enterBatch]] for this batch (recovery + own-marker sweep). */
  def verify(spark: SparkSession, treePath: String, positives: DataFrame,
      idCol: String): DataFrame = {
    val b = nBucketsOf(spark, treePath)
    val buckets = positives.select(bucketOf(col(idCol), b).as("tb"))
      .distinct().collect().map(_.getLong(0)).sorted
    val stored = spark.read.schema(idSchema).parquet(dir(treePath))
      .filter(col("tb").isin(buckets: _*))
      .select(col("id").as(idCol))
    positives.join(stored, Seq(idCol), "left_semi")
  }

  /** Fold a batch's admitted ids (call BEFORE the owning tree's commit
    * marker — see the class contract). Absent sidecar: bootstrap from
    * `storedIds` ∪ the batch (one O(corpus) adoption pass; pass the
    * empty frame on a cold tree) and pin `nBuckets` in `ids_meta`;
    * present: append the batch's ids under this batch's marker. */
  def fold(spark: SparkSession, treePath: String, newIds: DataFrame,
      idCol: String, batchId: Long, storedIds: => DataFrame,
      nBuckets: Int = 256): Unit = {
    import spark.implicits._
    val fs = Lsm.fs(spark, treePath)
    recover(fs, treePath)
    val stage = stageRoot(treePath)
    fs.delete(stage, true)
    val (b, ids) =
      if (!exists(spark, treePath)) {
        // meta commits BEFORE the data move: data present ⟹ meta present
        // (verify dispatches on data, so meta-without-data is harmless —
        // the bootstrap retry reuses the pinned B)
        Seq(nBuckets.toLong).toDF("n_buckets").write.mode("overwrite")
          .parquet(Lsm.stagedPath(treePath, "ids_meta", batchId))
        Lsm.commitSwap(fs, treePath, "ids_meta", batchId)
        (nBuckets, storedIds.select(col(idCol))
          .unionByName(newIds.select(col(idCol))).distinct())
      } else (nBucketsOf(spark, treePath), newIds.select(col(idCol)).distinct())
    ids.select(col(idCol).cast("long").as("id"))
      .withColumn("tb", bucketOf(col("id"), b))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(stage.toString)
    Lsm.moveMarked(fs, stage, new Path(dir(treePath)), s"b$batchId-")
    fs.delete(stage, true)
  }

  /** Merge per-bucket fragments (maintenance slot). `lastBatch` must be
    * COMMITTED — marked files above it are a crashed fold's orphans and
    * are swept first so they can never merge beyond their retry's reach. */
  def compact(spark: SparkSession, treePath: String, lastBatch: Long,
      maxFilesPerBucket: Int = 1): Unit = {
    val fs = Lsm.fs(spark, treePath)
    val idsRoot = new Path(dir(treePath))
    if (!fs.exists(idsRoot)) return
    recover(fs, treePath)
    Lsm.sweepAboveBatch(fs, idsRoot, lastBatch)
    fs.delete(stageRoot(treePath), true)
    Lsm.compactBuckets(spark, fs, idsRoot, compactStaged(treePath),
      compactOld(treePath), "tb=", maxFilesPerBucket)
  }
}
