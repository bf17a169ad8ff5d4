package graft.streaming

import graft.operators.Similarity
import graft.util.Lsm
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming embedding ingest — the [[DocIngest]] pattern for vectors:
  * a JSONL file-drop of (vec_id, embedding) records, each micro-batch
  * gated (exact re-delivery always; cosine near-dup optionally) and then
  * folded into the at-rest IVF index by [[Similarity.ivfInsert]] under
  * the batch-id-keyed protocol (batch 0 trains the coarse quantizer on
  * itself and swap-commits it; every batch then LSM-appends cell-assigned
  * vectors). The daemon therefore serves fresh ANN top-k
  * ([[Similarity.ivfTopKIndexed]]) at batch cost — one broadcast
  * centroid assignment over the batch, never a corpus re-assignment.
  *
  * With `compactEvery > 0`, every Nth batch also runs
  * [[Similarity.ivfCompact]] inside the same single-writer slot, so
  * per-cell fragment counts stay bounded over an unbounded batch
  * history — the full LSM contract, matching [[DocIngest]]'s index
  * compaction. The exact re-delivery gate rides the per-tree
  * [[graft.util.BloomSidecar]]: an all-novel batch never scans the
  * index's id column. With `pqIndexPath` set the daemon also folds the
  * compressed IVF-PQ twin ([[graft.operators.Pq.ivfPqCommitBatch]])
  * under the same batch id — ADC serving at daemon freshness — ordered
  * PQ-before-IVF so the gate tree's committed marker implies both folds
  * landed. Retrain (`retrainEvery`) repairs quantizer drift on BOTH
  * trees via MVCC version dirs — the serving tree re-assigns
  * ([[Similarity.ivfRetrain]]), the compressed twin re-trains its
  * codebooks and re-encodes from the serving tree's vectors
  * ([[graft.operators.Pq.ivfPqRetrain]]); readers stay
  * snapshot-consistent ([[Similarity.ivfRoot]], [[graft.operators.Pq.ivfPqRoot]]).
  *
  * Crash posture: file-source offsets checkpoint the stream; a replayed
  * batch re-delivers the same rows, [[commitEmbBatch]] no-ops on a
  * committed batch id and sweeps + redoes a crashed one. Single writer
  * by the checkpoint's exclusivity.
  */
object EmbIngest {

  /** JSONL embedding-event schema for the file drop. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Commit one embedding micro-batch idempotently — the vector edition
    * of [[DocIngest.commitDocBatch]], sharing its [[DocIngest.BatchResult]]
    * audit record. Gate order per batch:
    *   1. duplicate vec_id rows collapse deterministically (min embedding);
    *   2. vec_ids already stored by an EARLIER batch drop (re-delivery);
    *   3. with `dedupThreshold` set, cosine near-dups drop — within the
    *      batch (higher id of each [[Similarity.embNearDupWithin]] pair)
    *      and against the index ([[Similarity.embNearDupAgainstIndex]]);
    *   4. survivors fold via [[Similarity.ivfInsert]] (meta marker commits
    *      last, so the fold is the idempotence point).
    *
    * CRASH/RETRY — the fold's batch-id protocol, extended over the gate:
    * a committed batch id no-ops at entry; an uncommitted retry FIRST
    * sweeps its own crashed partial move ([[Lsm.sweepMarked]]) so the
    * gate's re-delivery and near-dup probes never see the first
    * attempt's partial files — the gate recomputation is then a
    * deterministic function of the batch and the pre-batch tree, and the
    * redone fold admits the same set. Cold start (no centroid table)
    * trains on the deduplicated batch and swap-commits the centroids
    * BEFORE any assignment, the [[Similarity.ivfCommitBatch]] argument. */
  def commitEmbBatch(spark: SparkSession, indexPath: String, batch: DataFrame,
      batchId: Long, nlist: Int = 16, dim: Int = 64,
      dedupThreshold: Option[Double] = None, nprobe: Int = 2,
      compactEvery: Int = 0, retrainEvery: Int = 0,
      pqIndexPath: Option[String] = None, pqM: Int = 8, pqKsub: Int = 16,
      pqResidual: Boolean = true,
      maxNlist: Int = 4096): DocIngest.BatchResult = {
    val fs = Lsm.fs(spark, indexPath)
    // retrain-aware entry recovery (a raw recoverSwap("centroids") here
    // would sweep a crashed post-marker retrain's staged twin as debris),
    // then the shared entry: committed no-op, or sweep this batch's own
    // partial move BEFORE the gate probes the tree (ivfInsert re-sweeps;
    // harmless)
    Similarity.recoverIvfTree(spark, indexPath)
    if (Lsm.enterBatch(spark, fs, indexPath, batchId).alreadyCommitted) {
      System.err.println(s"[embingest] batch $batchId: already committed")
      return DocIngest.BatchResult(0, 0, 0, 0)
    }
    // versioned-root resolution, once for the whole batch (single writer:
    // no retrain can race it); this batch's own crashed partial move
    // sweeps at the RESOLVED root before the gate probes the tree
    val root = Similarity.ivfRoot(spark, indexPath)
    Lsm.sweepMarked(fs, new Path(s"$root/vectors"), s"b$batchId-")
    // id-sidecar entry (recovery + own-marker sweep) — lives at the tree
    // top, not the version root: the admitted-id SET is retrain-invariant
    graft.util.IdTree.enterBatch(spark, indexPath, batchId)
    val uniq = batch.groupBy("vec_id")
      .agg(min(col("embedding")).as("embedding")).persist()
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame](uniq)
    // storageLevel guard: two gates can hand back plan-identical frames
    // (the limit(0) placeholders), and a second persist() of an already-
    // cached plan noisy-warns the daemon's logs every batch
    def cache(df: DataFrame): DataFrame = {
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        cached += df.persist()
      df
    }
    try {
      // materialize the cache before train + gate fan out on it — and guard
      // the empty drop: training on zero vectors would swap-commit an EMPTY
      // centroid table, after which every later batch assigns against
      // nothing and silently folds zero rows forever
      if (uniq.count() == 0L) {
        System.err.println(s"[embingest] batch $batchId: empty drop, skipped")
        return DocIngest.BatchResult(0, 0, 0, 0)
      }
      // cold-start training applies only to a fresh tree, where the
      // resolved root IS indexPath
      if (!fs.exists(new Path(s"$root/centroids"))) {
        Similarity.ivfCentroids(uniq, nlist, dim).write.mode("overwrite")
          .parquet(Lsm.stagedPath(indexPath, "centroids", batchId))
        Lsm.commitSwap(fs, indexPath, "centroids", batchId)
      }
      // DATA-file probe, not dir existence: a crashed first fold's sweep
      // leaves empty cid= dirs behind, and a bare-dir read would throw
      // "unable to infer schema" on every retry, wedging the daemon
      val indexExists = Lsm.hasBucketData(fs, new Path(s"$root/vectors"))
      def storedIds = spark.read.parquet(s"$root/vectors")
        .select(col("vec_id")).distinct()
      val emptyIds = uniq.select("vec_id").limit(0)
      // Re-delivery gate through the Bloom sidecar: bloom-negative ids are
      // definitely novel (the sidecar commits before every tree fold, so
      // it can never miss a stored id), and positives verify against the
      // bucketed id sidecar — ONLY the buckets the positives hash to are
      // read (partition-pruned), never the tree's full id column: the
      // r13-measured O(corpus)-per-batch verify curve, bounded. A
      // sidecar-less (legacy) tree falls back to the full scan and adopts
      // both sidecars at this batch's fold.
      val redelivered = cache(if (!indexExists) emptyIds
        else graft.util.BloomSidecar.read(spark, indexPath) match {
          case Some(bits) =>
            val positives = uniq
              .filter(graft.util.BloomSidecar.probe(bits, col("vec_id")))
              .select("vec_id")
            if (positives.isEmpty) emptyIds
            else if (graft.util.IdTree.exists(spark, indexPath))
              graft.util.IdTree.verify(spark, indexPath, positives, "vec_id")
            else positives.join(storedIds, Seq("vec_id"), "left_semi")
          case None => uniq.join(storedIds, Seq("vec_id"), "left_semi")
            .select("vec_id")
        })
      val (withinDrops, indexDrops) = dedupThreshold match {
        case Some(t) =>
          val centroids = spark.read.parquet(s"$root/centroids")
          val probes = cache(Similarity.ivfProbes(uniq, centroids, nprobe))
          val w = cache(Similarity.embNearDupWithin(probes, t)
            .select(col("b_id").as("vec_id")).distinct())
          val i = cache(if (indexExists)
            Similarity.embNearDupAgainstIndex(spark, indexPath, probes, t)
              .select(col("a_id").as("vec_id")).distinct()
          else w.limit(0))
          (w, i)
        case None =>
          val empty = cache(uniq.select("vec_id").limit(0))
          (empty, empty)
      }
      val admitted = cache(uniq.join(
        withinDrops.union(indexDrops).union(redelivered).distinct(),
        Seq("vec_id"), "left_anti"))
      val nAdmitted = admitted.count() // materialize before the fold reuses it
      // Compressed twin folds FIRST (SCALING deferred #10 closed): the
      // gate above reads only the uncompressed tree, so "IVF meta
      // committed" must imply "PQ fold committed" for the entry's
      // committed no-op to be safe. A crash between the two folds then
      // replays into a gate recomputation against the pre-batch serving
      // tree (identical admitted set), a PQ no-op on its own marker, and
      // a redone IVF fold. The PQ quantizer cold-trains on the whole
      // deduplicated drop (the uncompressed tree's centroid contract) but
      // folds only the admitted set, under the SAME batch id.
      // sidecar folds FIRST of all (the BloomSidecar ordering contract:
      // a crash after this leaves it a harmless superset; the reverse
      // order could admit a duplicate on a later re-delivery)
      graft.util.BloomSidecar.fold(spark, indexPath,
        admitted.select("vec_id"), "vec_id", batchId,
        storedIds = if (indexExists) storedIds else emptyIds)
      // id sidecar folds under the same pre-commit rule ([[graft.util
      // .IdTree]] contract: fold before the meta marker, sweep at entry);
      // a legacy tree bootstraps from the full id scan here — the one-time
      // adoption pass
      graft.util.IdTree.fold(spark, indexPath, admitted.select("vec_id"),
        "vec_id", batchId,
        storedIds = if (indexExists) storedIds else emptyIds)
      pqIndexPath.foreach { p =>
        graft.operators.Pq.ivfPqCommitBatch(spark, p, admitted, batchId,
          nlist = nlist, m = pqM, ksub = pqKsub, dim = dim,
          residual = pqResidual, trainOn = Some(uniq))
      }
      Similarity.ivfInsert(spark, indexPath, admitted, batchId)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
        Similarity.ivfCompact(spark, indexPath)
        pqIndexPath.foreach(graft.operators.Pq.ivfPqCompact(spark, _))
        // id-sidecar fragments merge in the same slot (this batch's meta
        // committed just above, so batchId is a safe sweep bound)
        graft.util.IdTree.compact(spark, indexPath, batchId)
        // saturation repair at the same cadence: re-create the bloom with
        // fresh headroom — from the compacted single-column id sidecar
        // when present (strictly cheaper than the tree's id scan)
        graft.util.BloomSidecar.rebuild(spark, indexPath,
          if (graft.util.IdTree.exists(spark, indexPath))
            graft.util.IdTree.readAll(spark, indexPath, "vec_id")
          else storedIds,
          "vec_id", batchId)
      }
      // periodic drift repair in the same single-writer slot: retrain the
      // coarse quantizer on everything served and re-assign (the fold's
      // frozen-centroid contract made whole); last_batch carries forward,
      // so a replay of THIS batch after the retrain still no-ops. The PQ
      // twin retrains alongside — quantizer AND codebooks re-trained and
      // every vector re-encoded from the serving tree's vector table
      // (both trees hold the same vec_id set here: both folds committed
      // above, PQ first) under the same MVCC version-dir protocol, so
      // ADC recall no longer decays unrepaired on a drifting corpus.
      // nlist tracks the served corpus at each retrain (√n rule, floored
      // at the configured value, capped at maxNlist): a frozen nlist on a
      // growing corpus densifies every cell linearly, growing every
      // cell-local gate/probe candidate set with corpus/nlist — adaptive
      // sizing keeps occupancy ~√n through unbounded growth. Counted on
      // the pre-retrain root (same vec_id set the retrain re-assigns).
      if (retrainEvery > 0 && batchId > 0 && batchId % retrainEvery == 0) {
        val nServed = spark.read
          .parquet(s"${Similarity.ivfRoot(spark, indexPath)}/vectors")
          .count()
        val nl = Similarity.adaptiveNlist(nServed, nlist, maxNlist)
        if (nl != nlist)
          System.err.println(s"[embingest] batch $batchId: retrain nlist " +
            s"$nlist -> $nl (served=$nServed)")
        Similarity.ivfRetrain(spark, indexPath, nl, dim)
        pqIndexPath.foreach { p =>
          val served = spark.read
            .parquet(s"${Similarity.ivfRoot(spark, indexPath)}/vectors")
            .select(col("vec_id"), col("embedding"))
          graft.operators.Pq.ivfPqRetrain(spark, p, served,
            nlistOverride = Some(nl))
        }
      }
      val r = DocIngest.BatchResult(nAdmitted,
        withinDrops.count(), indexDrops.count(), redelivered.count())
      System.err.println(s"[embingest] batch $batchId: admitted=${r.admitted} " +
        s"dropped_within=${r.droppedWithinBatch} " +
        s"dropped_vs_index=${r.droppedVsIndex} " +
        s"dropped_redelivered=${r.droppedRedelivered}")
      r
    } finally cached.foreach(_.unpersist())
  }

  /** Start the streaming fold: JSONL drops -> per-batch gated commit.
    * With `pqIndexPath` set the daemon maintains the compressed (IVF-PQ)
    * twin alongside the serving tree — ADC top-k at daemon freshness. */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      indexPath: String, nlist: Int = 16, dim: Int = 64,
      dedupThreshold: Option[Double] = None, nprobe: Int = 2,
      compactEvery: Int = 0, retrainEvery: Int = 0,
      pqIndexPath: Option[String] = None, pqM: Int = 8, pqKsub: Int = 16,
      pqResidual: Boolean = true, maxNlist: Int = 4096,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    spark.readStream.schema(embSchema).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitEmbBatch(spark, indexPath, batch, batchId, nlist = nlist,
          dim = dim, dedupThreshold = dedupThreshold, nprobe = nprobe,
          compactEvery = compactEvery, retrainEvery = retrainEvery,
          pqIndexPath = pqIndexPath, pqM = pqM, pqKsub = pqKsub,
          pqResidual = pqResidual, maxNlist = maxNlist)
        ()
      }
      .start()
}
