package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The shared crash/retry primitives behind every at-rest incremental
  * state tree in the library — the BM25 inverted index
  * ([[graft.operators.Retrieval.invIndexInsert]]), label-propagation
  * communities ([[graft.operators.Graph.lpCommitBatch]]), Bradley–Terry
  * preference state ([[graft.operators.Experiment.btCommitBatch]]) and
  * the IVF vector index ([[graft.operators.Similarity.ivfInsert]]).
  * All four daemons ride the same two protocols; this module is the
  * single implementation so a fix to one crash window fixes them all.
  *
  * == Protocol 1: atomic directory swap ==
  *
  * A state directory (`stats`, `state`, `meta`, …) is replaced by
  * writing its successor to `<name>_staged_b<id>`, renaming the live
  * dir to `<name>_old_b<id>`, renaming the staged twin in, and deleting
  * the old twin — two metadata renames, never an in-place overwrite
  * whose delete-then-rewrite window can zero live state. Entry-time
  * [[recoverSwap]] handles every crash point: a missing live dir with
  * BOTH twins rolls FORWARD from the staged one (the old twin proves
  * commitSwap started, hence staged was fully written), a missing live
  * dir with only the old twin rolls BACK (the interrupted fold then
  * redoes cleanly), a missing live dir with only a staged twin is a
  * cold-start crash mid-staged-write — possibly partial — and is swept
  * so the batch retry rebuilds it, and with the live dir present any
  * remaining twin is committed-swap debris and is swept.
  *
  * == Protocol 2: batch-marked LSM append ==
  *
  * Data files append into hash-bucketed partition dirs (`tb=…`,
  * `cid=…`) under batch-marked names (`b<id>-…`): the batch first
  * materializes under a staged root ([[moveMarked]] then renames each
  * file into its bucket), and the batch's marker commits LAST via
  * protocol 1. A retry either sees its id committed (no-op) or
  * [[sweepMarked]]s exactly its own partial move and redoes the fold —
  * the double-append window of a naive read-modify-write cannot occur.
  * [[compactBuckets]] closes the loop: fragments merge per-bucket under
  * a staged swap ([[recoverBucketSwap]] at entry), after
  * [[sweepAboveBatch]] removes any crashed fold's orphans so they can
  * never be compacted into unmarked files beyond their retry's reach.
  *
  * Single writer per tree by contract (a streaming checkpoint's
  * exclusivity, or the caller's); readers never see twin roots because
  * they live beside — not inside — the partition roots.
  */
object Lsm {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `<parent>/<name>_staged_b<id>` — where a swap's successor is written. */
  def stagedPath(parent: String, name: String, batchId: Long): String =
    s"$parent/${name}_staged_b$batchId"

  /** Writer-entry state for one batch against an at-rest tree:
    * the tree's committed batch id and whether THIS batch already is it. */
  final case class BatchEntry(lastBatch: Long, alreadyCommitted: Boolean)

  /** The committed batch id a tree's meta table records, or -1 when the
    * meta dir is absent or predates the incremental protocol (no
    * `last_batch` column — a pre-fold tree being adopted). The caller
    * must have run its swap recovery for the meta dir first. */
  def committedBatch(spark: SparkSession, fs: FileSystem, path: String,
      metaDir: String = "meta"): Long = {
    if (!fs.exists(new Path(s"$path/$metaDir"))) -1L
    else {
      val row = spark.read.parquet(s"$path/$metaDir").collect()(0)
      if (row.schema.fieldNames.contains("last_batch"))
        row.getAs[Long]("last_batch")
      else -1L
    }
  }

  /** The shared daemon writer entry, hoisted from the per-tree folds
    * (BM25 postings, IVF vectors, IVF-PQ codes, perceptual-hash chunks,
    * LP/BT state): read the committed batch id from `metaDir`; a
    * committed retry returns `alreadyCommitted = true` (the caller
    * no-ops — and the batch's marked files MUST stay); otherwise sweep
    * exactly this batch's partial move from every `markedRoots` bucket
    * tree (protocol 2's retry rule) so the caller's gate probes and
    * redone fold see only the pre-batch tree. The caller runs its
    * tree-specific swap recovery (recoverSwap / recoverIvfTree) BEFORE
    * this — recovery order is where the retrain/fold crash interactions
    * live, and it differs per tree. */
  def enterBatch(spark: SparkSession, fs: FileSystem, path: String,
      batchId: Long, metaDir: String = "meta",
      markedRoots: Seq[String] = Seq.empty): BatchEntry = {
    val lastBatch = committedBatch(spark, fs, path, metaDir)
    if (lastBatch == batchId) BatchEntry(lastBatch, alreadyCommitted = true)
    else {
      markedRoots.foreach(r =>
        sweepMarked(fs, new Path(s"$path/$r"), s"b$batchId-"))
      BatchEntry(lastBatch, alreadyCommitted = false)
    }
  }

  /** True iff the tree under `root` holds at least one DATA file,
    * recursively — the existence probe gates must use instead of
    * `fs.exists(root)`: after a crashed first fold's sweep the partition
    * dirs remain but hold nothing, and a bare-dir parquet read throws
    * "unable to infer schema" on every retry, wedging the daemon until
    * the dir is deleted by hand. Short-circuits on the first data file. */
  def hasBucketData(fs: FileSystem, root: Path): Boolean =
    fs.exists(root) && {
      // hidden entries (_SUCCESS, _temporary/, .crc) are invisible to the
      // reader, so they are invisible here too — a pending task file
      // inside _temporary/ must not count as served data
      val entries = fs.listStatus(root).filter(s =>
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      entries.exists(_.isFile) ||
      entries.exists(s => s.isDirectory && hasBucketData(fs, s.getPath))
    }

  // ---- MVCC version dirs (protocol 3) --------------------------------
  // A full-tree rebuild (retrain/re-encode) publishes its successor
  // tables COMPLETELY under a fresh `path/v<n>/`, then one atomic
  // `_committed` marker-file create commits it. Readers resolve the
  // highest committed version once per query and are snapshot-consistent;
  // the legacy layout (tables at `path` itself) is implicit version 0.
  // Shared by the IVF serving tree (Similarity) and the IVF-PQ twin (Pq).

  private val versionDir = "^v(\\d+)$".r

  /** The COMMITTED version numbers under `path`, ascending. */
  def committedVersions(fs: FileSystem, path: String): Seq[Int] =
    if (!fs.exists(new Path(path))) Seq.empty
    else fs.listStatus(new Path(path)).filter(_.isDirectory)
      .flatMap(d => versionDir.findFirstMatchIn(d.getPath.getName)
        .map(_.group(1).toInt))
      .filter(n => fs.exists(new Path(s"$path/v$n/_committed")))
      .toSeq.sorted

  /** The root a reader must use: the highest committed version dir, or
    * `path` itself for a never-rebuilt tree. Resolve ONCE per query. */
  def versionedRoot(fs: FileSystem, path: String): String = {
    val vs = committedVersions(fs, path)
    if (vs.isEmpty) path else s"$path/v${vs.max}"
  }

  /** Sweep UNCOMMITTED version dirs — a crashed rebuild's debris (the
    * marker commits atomically, so its absence means no reader ever
    * resolved the dir). Run at every writer entry. */
  def sweepUncommittedVersions(fs: FileSystem, path: String): Unit =
    if (fs.exists(new Path(path)))
      fs.listStatus(new Path(path)).filter(_.isDirectory)
        .filter(d => versionDir.findFirstMatchIn(d.getPath.getName).isDefined)
        .filterNot(d => fs.exists(new Path(d.getPath, "_committed")))
        .foreach(d => fs.delete(d.getPath, true))

  /** Retire superseded committed versions. `graceOne = true` (rebuild
    * time) keeps the most recently superseded root on disk so readers
    * that resolved it pre-publish finish on intact tables; `graceOne =
    * false` (maintenance/compaction time — a later single-writer slot,
    * so the publish-time readers have had a full slot to drain) keeps
    * only the current version. `legacyDirs` are the implicit-v0 tables
    * at the tree top, retired under the same grace rule. Storage is
    * thereby bounded at 2× transiently and 1× from the next maintenance
    * slot on — a once-rebuilt tree no longer carries its superseded twin
    * until the NEXT rebuild (the r12 verdict's MVCC storage gap). */
  def retireSupersededVersions(fs: FileSystem, path: String,
      legacyDirs: Seq[String], graceOne: Boolean): Unit = {
    val vs = committedVersions(fs, path)
    if (vs.nonEmpty) {
      val keepMin = if (graceOne) vs.max - 1 else vs.max
      vs.filter(_ < keepMin)
        .foreach(n => fs.delete(new Path(s"$path/v$n"), true))
      if (!graceOne || vs.max >= 2)
        legacyDirs.foreach(d => fs.delete(new Path(s"$path/$d"), true))
    }
  }

  /** Protocol-1 entry recovery for `<parent>/<name>`: roll a mid-swap
    * crash forward from the staged twin or back from the old one, then
    * sweep committed-swap debris. Always call before reading the dir.
    *
    * The staged twin proves itself COMPLETE only when the matching old
    * twin also exists (commitSwap renamed live away, which happens after
    * the caller finished writing staged). A staged twin beside a missing
    * live dir with NO old twin is a cold-start crash mid-staged-write —
    * possibly PARTIAL (a cold commitSwap skips the live→old rename and
    * its staged→live rename is atomic, so no post-write crash point
    * leaves this state) — and rolling it forward would publish a
    * half-written table that fs.exists checks then treat as live state
    * forever. It is swept instead: the batch marker always commits after
    * the swapped dir, so the crashed batch retries and rebuilds it. */
  def recoverSwap(fs: FileSystem, parent: String, name: String): Unit = {
    val live = new Path(s"$parent/$name")
    def twins(prefix: String): Seq[Path] =
      if (!fs.exists(new Path(parent))) Seq.empty
      else fs.listStatus(new Path(parent)).map(_.getPath)
        .filter(_.getName.startsWith(prefix)).toSeq
    if (!fs.exists(live)) {
      val staged = twins(s"${name}_staged_b")
      val old = twins(s"${name}_old_b")
      if (staged.nonEmpty && old.nonEmpty) fs.rename(staged.head, live)
      else if (old.nonEmpty) fs.rename(old.head, live)
      // staged-only: cold-start partial write — fall through to the sweep
    }
    (twins(s"${name}_staged_b") ++ twins(s"${name}_old_b"))
      .foreach(p => fs.delete(p, true))
  }

  /** Protocol-1 commit: swap `<parent>/<name>_staged_b<id>` (already
    * written by the caller) into `<parent>/<name>`. */
  def commitSwap(fs: FileSystem, parent: String, name: String,
      batchId: Long): Unit = {
    val live = new Path(s"$parent/$name")
    val old = new Path(s"$parent/${name}_old_b$batchId")
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(new Path(stagedPath(parent, name, batchId)), live)
    fs.delete(old, true)
  }

  private def dataFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))

  /** Protocol-2 move: rename every data file under `stagedRoot`'s
    * partition dirs into the same-named dir under `bucketsRoot`, each
    * prefixed with `marker` (`b<id>-`). Partial moves are exactly what
    * [[sweepMarked]] identifies and removes on retry. */
  def moveMarked(fs: FileSystem, stagedRoot: Path, bucketsRoot: Path,
      marker: String): Unit = {
    fs.listStatus(stagedRoot).filter(_.isDirectory).foreach { part =>
      val target = new Path(bucketsRoot, part.getPath.getName)
      fs.mkdirs(target)
      dataFiles(fs, part.getPath).foreach { f =>
        fs.rename(f.getPath, new Path(target, marker + f.getPath.getName))
      }
    }
  }

  /** Remove every `marker`-prefixed file under `bucketsRoot`'s partition
    * dirs — a crashed attempt's partial move, before its retry refolds. */
  def sweepMarked(fs: FileSystem, bucketsRoot: Path, marker: String): Unit =
    if (fs.exists(bucketsRoot))
      fs.listStatus(bucketsRoot).filter(_.isDirectory).foreach { part =>
        fs.listStatus(part.getPath)
          .filter(f => f.getPath.getName.startsWith(marker))
          .foreach(f => fs.delete(f.getPath, false))
      }

  /** Remove every batch-marked file whose id exceeds `lastBatch` — a
    * crashed (uncommitted) fold's orphans. MUST run before compaction:
    * merged into an unmarked file they would escape the fold's own
    * recovery sweep and double-append when the batch retries. */
  def sweepAboveBatch(fs: FileSystem, bucketsRoot: Path,
      lastBatch: Long): Unit = {
    val marked = "^b(\\d+)-".r
    if (fs.exists(bucketsRoot))
      fs.listStatus(bucketsRoot).filter(_.isDirectory).foreach { part =>
        fs.listStatus(part.getPath).foreach { f =>
          marked.findFirstMatchIn(f.getPath.getName).foreach { m =>
            if (m.group(1).toLong > lastBatch) fs.delete(f.getPath, false)
          }
        }
      }
  }

  /** Entry recovery for a crashed [[compactBuckets]]: restore any bucket
    * renamed away mid-swap from whichever twin is complete (staged when
    * present — content-equal by construction — else old), then drop both
    * twin roots. The twin roots live OUTSIDE the partition root so a
    * reader's partition discovery never sees them. */
  def recoverBucketSwap(fs: FileSystem, bucketsRoot: Path, stagedRoot: Path,
      oldRoot: Path): Unit = {
    if (fs.exists(oldRoot))
      fs.listStatus(oldRoot).map(_.getPath).foreach { old =>
        val live = new Path(bucketsRoot, old.getName)
        val st = new Path(stagedRoot, old.getName)
        if (!fs.exists(live)) {
          if (fs.exists(st)) fs.rename(st, live) else fs.rename(old, live)
        }
        fs.delete(old, true)
      }
    fs.delete(stagedRoot, true)
    fs.delete(oldRoot, true)
  }

  /** Merge every partition dir under `bucketsRoot` (name-prefixed
    * `bucketPrefix`, e.g. "tb=" / "cid=") holding more than
    * `maxFilesPerBucket` data files into one fresh file, content-
    * identical. Caller must have run [[recoverBucketSwap]] and
    * [[sweepAboveBatch]] first.
    *
    * ONE staging job, per-bucket swap: all fragmented buckets are
    * re-read through partition discovery (the bucket column prunes to
    * exactly the fragmented values), repartitioned BY the bucket column
    * (each bucket lands in exactly one task → one output file) and
    * written `partitionBy` under `stagedRoot` in a single Spark job —
    * the r13 EmbSoak finding: the previous one-job-PER-bucket loop made
    * the maintenance slot job-count-bound at nlist ≥ 256 (~770 tiny
    * jobs, 137 s; one job stages the same bytes in seconds). The COMMIT
    * remains per-bucket (live→old, staged→live, delete old — metadata
    * renames), so crash recovery is [[recoverBucketSwap]] unchanged: a
    * crash mid-staging leaves a staged root with no old twins (swept),
    * mid-swap leaves per-bucket twins (restored per bucket). */
  def compactBuckets(spark: SparkSession, fsys: FileSystem, bucketsRoot: Path,
      stagedRoot: Path, oldRoot: Path, bucketPrefix: String,
      maxFilesPerBucket: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val fragmented = fsys.listStatus(bucketsRoot).map(_.getPath)
      .filter(p => p.getName.startsWith(bucketPrefix) &&
        dataFiles(fsys, p).length > maxFilesPerBucket)
    if (fragmented.isEmpty) {
      fsys.delete(stagedRoot, true)
      fsys.delete(oldRoot, true)
      return
    }
    val partCol = bucketPrefix.stripSuffix("=")
    val values = fragmented.map(_.getName.stripPrefix(bucketPrefix)).toSeq
    spark.read.parquet(bucketsRoot.toString)
      .filter(col(partCol).cast("string").isin(values: _*))
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(stagedRoot.toString)
    for (bucket <- fragmented) {
      val st = new Path(stagedRoot, bucket.getName)
      if (fsys.exists(st)) {
        fsys.mkdirs(oldRoot)
        val old = new Path(oldRoot, bucket.getName)
        fsys.rename(bucket, old)
        fsys.rename(st, bucket)
        fsys.delete(old, true)
      } else {
        // No staged twin ⇒ the filtered read yielded ZERO rows for this
        // bucket (partitionBy writes a dir for every non-empty value) —
        // e.g. all its data files are row-less. Left alone it re-lists
        // as fragmented on every maintenance slot forever; verify the
        // zero-row claim against the live bucket and clear its residual
        // data files. A non-empty read here would mean the staging job
        // dropped live rows (filter/cast mismatch) — never delete then.
        val empty = spark.read.parquet(bucket.toString).isEmpty
        if (empty) dataFiles(fsys, bucket).foreach(f =>
          fsys.delete(f.getPath, false))
        else System.err.println(s"[lsm] compactBuckets: bucket " +
          s"${bucket.getName} has rows but no staged twin — left intact")
      }
    }
    fsys.delete(stagedRoot, true)
    fsys.delete(oldRoot, true)
  }
}
