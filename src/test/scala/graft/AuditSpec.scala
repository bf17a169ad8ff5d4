package graft

import graft.operators.Audit
import scala.util.Random

class AuditSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(ids: Seq[Long]): (Long, Long, Long, Seq[(Long, Long, Long)]) = {
    val sorted = ids.distinct.sorted
    val gaps = sorted.zip(sorted.tail).collect {
      case (a, b) if b - a > 1 => (a, b, b - a - 1)
    }
    (gaps.size.toLong, gaps.map(_._3).sum, if (gaps.isEmpty) 0L else gaps.map(_._3).max, gaps)
  }

  private def check(ids: Seq[Long], width: Long, levels: Int = 2): Unit = {
    val df = ids.toDF("id")
    val (nGaps, missing, maxGap, detail) = bruteForce(ids)
    val audit = Audit.gapAudit(df, "id", width, levels).collect().head
    assert(audit.getLong(0) == nGaps, s"width=$width levels=$levels total_gaps")
    assert(audit.getLong(1) == missing, s"width=$width levels=$levels total_missing")
    assert(audit.getLong(2) == maxGap, s"width=$width levels=$levels max_gap")
    val details = Audit.gapDetails(df, "id", width, levels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(details.toSeq == detail, s"width=$width levels=$levels details")
  }

  test("gap audit matches brute force across bucket widths") {
    val rnd = new Random(42)
    val ids = (0L until 5000L).filter(_ => rnd.nextDouble() > 0.3)
    for (w <- Seq(1L, 7L, 64L, 1L << 20)) check(ids, w)
  }

  test("gap audit: every recursion depth agrees with the global walk") {
    val rnd = new Random(7)
    // sparse over a wide id space so deep levels see non-trivial super-buckets
    val ids = (0 until 2000).map(_ => (rnd.nextDouble() * 1e7).toLong).distinct
    for (levels <- 1 to 4; w <- Seq(8L, 64L)) check(ids, w, levels)
    // fully-empty super-bucket spans survive deep recursion
    check(Seq(3L, 70000000L, 70000001L), 16L, levels = 4)
  }

  test("gap audit: no gaps and empty-ish inputs") {
    check(0L until 100L, 16L)
    check(Seq(42L), 16L)
    // entirely-missing buckets between two sparse ids
    check(Seq(5L, 5000000L), 1024L)
  }

  test("reconcile produces one row of stage counts") {
    val a = (1 to 10).toDF("x"); val b = (1 to 7).toDF("x")
    val r = Audit.reconcile(Seq("n_a" -> a, "n_b" -> b)).collect().head
    assert(r.getLong(0) == 10 && r.getLong(1) == 7)
  }
}
