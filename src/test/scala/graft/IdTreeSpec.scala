package graft

import graft.util.{IdTree, Lsm}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The bucketed admitted-id sidecar that bounds the re-delivery gate's
  * positive-verification scan: exact verify (present ids found, absent
  * ids not), bucket-level partition pruning (poison-file proof — a
  * corrupt file in an un-probed bucket must never be read), protocol-2
  * crash/retry (own-marker sweep restores the pre-batch set), and
  * maintenance compaction that preserves content. */
class IdTreeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("fold + verify: exact membership, bootstrap includes storedIds") {
    val dir = tmp("idtree")
    val empty = Seq.empty[Long].toDF("id")
    // bootstrap: stored (pre-sidecar tree) 0..49, batch folds 100..119
    IdTree.fold(spark, dir, (100L until 120L).toDF("id"), "id", 5L,
      storedIds = (0L until 50L).toDF("id"), nBuckets = 8)
    assert(IdTree.exists(spark, dir))
    val probe = ((0L until 10L) ++ (100L until 105L) ++ (900L until 905L))
      .toDF("id")
    val found = IdTree.verify(spark, dir, probe, "id")
      .collect().map(_.getLong(0)).sorted
    assert(found.toSeq == ((0L until 10L) ++ (100L until 105L)).sorted,
      "bootstrapped stored ids AND folded batch ids verify; novel ids don't")
    // second fold appends at the pinned bucket count
    IdTree.fold(spark, dir, (200L until 210L).toDF("id"), "id", 6L, empty)
    assert(IdTree.verify(spark, dir, (200L until 210L).toDF("id"), "id")
      .count() == 10L)
    assert(IdTree.readAll(spark, dir, "id").distinct().count() == 80L)
  }

  test("verify reads ONLY the positives' buckets (poison-file pruning proof)") {
    val dir = tmp("idtree-prune")
    IdTree.fold(spark, dir, (0L until 64L).toDF("id"), "id", 0L,
      storedIds = Seq.empty[Long].toDF("id"), nBuckets = 16)
    // probe two ids (one stored, one novel); poison every bucket dir
    // NEITHER hashes to — if pruning failed, the read would throw on the
    // poison file's footer (a novel positive's bucket is legitimately
    // read: that's the fpp-verification path)
    val probeIds = Seq(7L, 100000L)
    val probedBuckets = probeIds.toDF("id")
      .select(IdTree.bucketOf(col("id"), 16)).collect().map(_.getLong(0)).toSet
    val fs = Lsm.fs(spark, dir)
    val buckets = fs.listStatus(new Path(s"$dir/ids")).filter(_.isDirectory)
    assert(buckets.length > 4, "fixture must populate several buckets")
    buckets.filterNot(d =>
        probedBuckets(d.getPath.getName.stripPrefix("tb=").toLong)).foreach { d =>
      val out = fs.create(new Path(d.getPath, "poison.parquet"))
      out.write("not a parquet file".getBytes); out.close()
    }
    val found = IdTree.verify(spark, dir, probeIds.toDF("id"), "id")
      .collect().map(_.getLong(0))
    assert(found.toSeq == Seq(7L),
      "verify must prune to the probed buckets and still decide exactly")
    buckets.foreach(d => fs.delete(new Path(d.getPath, "poison.parquet"), false))
  }

  test("crash/retry: entry sweep removes exactly this batch's partial fold") {
    val dir = tmp("idtree-crash")
    val empty = Seq.empty[Long].toDF("id")
    IdTree.fold(spark, dir, (0L until 20L).toDF("id"), "id", 0L, empty,
      nBuckets = 4)
    // batch 1 folds, then "crashes" before its owner's commit marker:
    // the retry's entry sweep must restore the pre-batch set exactly
    IdTree.fold(spark, dir, (100L until 110L).toDF("id"), "id", 1L, empty)
    assert(IdTree.verify(spark, dir, (100L until 110L).toDF("id"), "id")
      .count() == 10L)
    IdTree.enterBatch(spark, dir, 1L)
    assert(IdTree.verify(spark, dir, (100L until 110L).toDF("id"), "id")
      .count() == 0L, "own-marker sweep must remove the crashed fold")
    assert(IdTree.verify(spark, dir, (0L until 20L).toDF("id"), "id")
      .count() == 20L, "earlier batches untouched")
    // the redone fold reconverges
    IdTree.fold(spark, dir, (100L until 110L).toDF("id"), "id", 1L, empty)
    assert(IdTree.readAll(spark, dir, "id").distinct().count() == 30L)
  }

  test("compact: one file per bucket, content identical, orphans above lastBatch swept") {
    val dir = tmp("idtree-compact")
    val empty = Seq.empty[Long].toDF("id")
    for (b <- 0 until 6)
      IdTree.fold(spark, dir, (b * 10L until b * 10L + 10L).toDF("id"), "id",
        b.toLong, empty, nBuckets = 4)
    // an uncommitted batch-9 orphan (crashed fold beyond lastBatch)
    IdTree.fold(spark, dir, Seq(999L).toDF("id"), "id", 9L, empty)
    IdTree.compact(spark, dir, lastBatch = 5L)
    val fs = Lsm.fs(spark, dir)
    val maxFiles = fs.listStatus(new Path(s"$dir/ids")).filter(_.isDirectory)
      .map(d => fs.listStatus(d.getPath).count(f => f.isFile &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))).max
    assert(maxFiles == 1, s"buckets must compact to one file, got $maxFiles")
    val all = IdTree.readAll(spark, dir, "id").collect().map(_.getLong(0)).sorted
    assert(all.toSeq == (0L until 60L).sorted,
      "content preserved; the beyond-lastBatch orphan swept")
  }
}
