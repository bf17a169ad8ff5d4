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
}
