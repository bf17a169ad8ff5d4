package graft

import graft.util.Lsm
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the shared LSM crash/retry primitives — the daemon
  * specs drive them end-to-end; these pin the per-crash-point semantics
  * of [[Lsm.recoverSwap]] (in particular the cold-start rule: a staged
  * twin with NO old twin is a possibly-partial cold write and must be
  * swept, never rolled forward) and the data-file existence probe
  * [[Lsm.hasBucketData]] daemon gates use instead of fs.exists. */
class LsmSpec extends SparkSpec {

  private def tmpFs() = {
    val dir = java.nio.file.Files.createTempDirectory("lsm").toString
    (dir, Lsm.fs(spark, dir))
  }
  private def touch(fs: org.apache.hadoop.fs.FileSystem, p: String): Unit = {
    fs.mkdirs(new Path(p).getParent)
    fs.create(new Path(p)).close()
  }

  test("recoverSwap: staged + old twins roll FORWARD from staged") {
    val (dir, fs) = tmpFs()
    // crash between commitSwap's two renames: live renamed away, staged
    // not yet renamed in — the old twin proves staged was fully written
    touch(fs, s"$dir/state_staged_b3/new.parquet")
    touch(fs, s"$dir/state_old_b3/old.parquet")
    Lsm.recoverSwap(fs, dir, "state")
    assert(fs.exists(new Path(s"$dir/state/new.parquet")), "forward roll")
    assert(!fs.exists(new Path(s"$dir/state_staged_b3")) &&
      !fs.exists(new Path(s"$dir/state_old_b3")), "twins swept")
  }

  test("recoverSwap: old twin alone rolls BACK") {
    val (dir, fs) = tmpFs()
    touch(fs, s"$dir/state_old_b3/old.parquet")
    Lsm.recoverSwap(fs, dir, "state")
    assert(fs.exists(new Path(s"$dir/state/old.parquet")), "rollback")
    assert(!fs.exists(new Path(s"$dir/state_old_b3")))
  }

  test("recoverSwap: staged twin alone (cold-start partial write) is SWEPT, not published") {
    val (dir, fs) = tmpFs()
    // cold start: live never existed; crash mid-staged-write leaves a
    // PARTIAL staged dir. Rolling it forward would publish a half-written
    // table that fs.exists checks then treat as live state forever.
    touch(fs, s"$dir/state_staged_b0/partial.parquet")
    Lsm.recoverSwap(fs, dir, "state")
    assert(!fs.exists(new Path(s"$dir/state")),
      "a partial cold-start staged twin must never become the live dir")
    assert(!fs.exists(new Path(s"$dir/state_staged_b0")), "twin swept")
  }

  test("recoverSwap: with live present, any twin is committed-swap debris") {
    val (dir, fs) = tmpFs()
    touch(fs, s"$dir/state/live.parquet")
    touch(fs, s"$dir/state_staged_b4/x.parquet")
    touch(fs, s"$dir/state_old_b4/y.parquet")
    Lsm.recoverSwap(fs, dir, "state")
    assert(fs.exists(new Path(s"$dir/state/live.parquet")), "live untouched")
    assert(!fs.exists(new Path(s"$dir/state_staged_b4")) &&
      !fs.exists(new Path(s"$dir/state_old_b4")))
  }

  test("hasBucketData: bare dirs, empty partitions and _temporary debris are not data") {
    val (dir, fs) = tmpFs()
    val root = new Path(s"$dir/vectors")
    assert(!Lsm.hasBucketData(fs, root), "missing root")
    fs.mkdirs(new Path(s"$dir/vectors/cid=0"))
    fs.mkdirs(new Path(s"$dir/vectors/cid=1"))
    assert(!Lsm.hasBucketData(fs, root),
      "empty partition dirs (a crashed first fold's sweep residue) are not an index")
    touch(fs, s"$dir/vectors/_SUCCESS")
    touch(fs, s"$dir/vectors/cid=0/_temporary/0/task/part-0.parquet")
    assert(!Lsm.hasBucketData(fs, root),
      "pending task files under _temporary are invisible to the reader")
    touch(fs, s"$dir/vectors/cid=1/b0-part-0.parquet")
    assert(Lsm.hasBucketData(fs, root), "one data file flips it")
  }

  test("enterBatch: committed id no-ops and KEEPS its marked files; uncommitted sweeps them") {
    import spark.implicits._
    val (dir, fs) = tmpFs()
    Seq(7L).toDF("last_batch").write.parquet(s"$dir/meta")
    touch(fs, s"$dir/vectors/cid=0/b7-data.parquet")
    touch(fs, s"$dir/vectors/cid=0/b8-crashed.parquet")
    val committed = Lsm.enterBatch(spark, fs, dir, 7L, markedRoots = Seq("vectors"))
    assert(committed.alreadyCommitted && committed.lastBatch == 7L)
    assert(fs.exists(new Path(s"$dir/vectors/cid=0/b7-data.parquet")),
      "a committed batch's files must survive its retry's entry")
    val retry = Lsm.enterBatch(spark, fs, dir, 8L, markedRoots = Seq("vectors"))
    assert(!retry.alreadyCommitted && retry.lastBatch == 7L)
    assert(!fs.exists(new Path(s"$dir/vectors/cid=0/b8-crashed.parquet")),
      "an uncommitted retry sweeps exactly its own partial move")
    assert(fs.exists(new Path(s"$dir/vectors/cid=0/b7-data.parquet")))
  }

  test("enterBatch: missing meta and pre-incremental meta both read as -1") {
    import spark.implicits._
    val (dir, fs) = tmpFs()
    assert(Lsm.enterBatch(spark, fs, dir, 0L).lastBatch == -1L)
    val (dir2, fs2) = tmpFs()
    Seq((true, 16L)).toDF("residual", "nlist").write.parquet(s"$dir2/meta")
    assert(Lsm.enterBatch(spark, fs2, dir2, 0L).lastBatch == -1L,
      "a tree predating the fold protocol is adopted at -1")
  }

  test("compactBuckets: a zero-row fragmented bucket is cleared, not re-listed forever") {
    import spark.implicits._
    val (dir, fs) = tmpFs()
    val buckets = s"$dir/buckets"
    // tb=0: three real fragments. tb=1: three ZERO-ROW parquet files (valid
    // footers, no rows) — the staging job's partitionBy writes no twin for
    // a value with no rows, which used to leave the bucket permanently
    // fragmented (re-listed every maintenance slot).
    Seq(1L, 2L).toDF("id").coalesce(1).write.parquet(s"$dir/f0")
    Seq(3L).toDF("id").coalesce(1).write.parquet(s"$dir/f1")
    Seq(4L).toDF("id").coalesce(1).write.parquet(s"$dir/f2")
    Seq.empty[Long].toDF("id").coalesce(1).write.parquet(s"$dir/fe")
    def dataFile(src: String) = fs.listStatus(new Path(src))
      .map(_.getPath).filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_")).head
    for ((src, i) <- Seq("f0", "f1", "f2").zipWithIndex) {
      fs.mkdirs(new Path(s"$buckets/tb=0"))
      fs.rename(dataFile(s"$dir/$src"), new Path(s"$buckets/tb=0/b$i-p.parquet"))
    }
    val emptyFile = dataFile(s"$dir/fe")
    for (i <- 0 until 3) {
      fs.mkdirs(new Path(s"$buckets/tb=1"))
      org.apache.hadoop.fs.FileUtil.copy(fs, emptyFile, fs,
        new Path(s"$buckets/tb=1/b$i-p.parquet"), false,
        spark.sparkContext.hadoopConfiguration)
    }
    Lsm.compactBuckets(spark, fs, new Path(buckets),
      new Path(s"$dir/staged"), new Path(s"$dir/old"), "tb=",
      maxFilesPerBucket = 2)
    def nData(b: String) = fs.listStatus(new Path(s"$buckets/$b"))
      .count(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
    assert(nData("tb=0") == 1, "real fragments merge to one file")
    assert(nData("tb=1") == 0, "zero-row residuals are cleared")
    val rows = spark.read.parquet(buckets).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L, 4L), "content identical")
    // and the next slot no longer lists tb=1 as fragmented (no data files)
    Lsm.compactBuckets(spark, fs, new Path(buckets),
      new Path(s"$dir/staged"), new Path(s"$dir/old"), "tb=",
      maxFilesPerBucket = 2)
    assert(nData("tb=1") == 0 && nData("tb=0") == 1)
  }
}
