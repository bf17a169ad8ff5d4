package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)]) =
    (for {
      (pid, t) <- points
      (iid, lo, hi) <- ivs
      if t >= lo && t <= hi
    } yield (pid, iid)).toSet

  test("matches the naive non-equi join on random data, any bucket width") {
    val rnd = new scala.util.Random(42)
    val points = (0 until 300).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val ivs = (0 until 40).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (1000L + i, lo, lo + rnd.nextInt(120))
    }
    val p = points.toDF("pid", "t")
    val iv = ivs.toDF("iid", "lo", "hi")
    for (w <- Seq(1L, 7L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(p, "t", iv, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive(points, ivs), s"bucketWidth=$w")
    }
  }

  test("bounds are inclusive and each match appears exactly once") {
    val p = Seq((1L, 10L), (2L, 20L), (3L, 15L)).toDF("pid", "t")
    val iv = Seq((7L, 10L, 20L)).toDF("iid", "lo", "hi")
    // width smaller than the interval: it spans several buckets, but each
    // point matches it exactly once
    val rows = RangeJoin.pointInInterval(p, "t", iv, "lo", "hi", 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(rows.sorted == Seq((1L, 7L), (2L, 7L), (3L, 7L)))
  }

  test("negative domains bucket correctly (truncating div is monotone)") {
    val points = Seq((1L, -10L), (2L, -1L), (3L, 0L), (4L, 3L))
    val ivs = Seq((9L, -5L, 2L))
    val got = RangeJoin.pointInInterval(
      points.toDF("pid", "t"), "t", ivs.toDF("iid", "lo", "hi"), "lo", "hi", 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive(points, ivs))
  }

  test("inverted intervals match nothing") {
    val p = Seq((1L, 10L)).toDF("pid", "t")
    val iv = Seq((7L, 20L, 10L)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(p, "t", iv, "lo", "hi", 4L).count() == 0)
  }

  test("plans as an equi join, never a nested loop") {
    val p = spark.range(1000).select(col("id").as("pid"), (col("id") * 3).as("t"))
    val iv = spark.range(50).select(col("id").as("iid"),
      (col("id") * 60).as("lo"), (col("id") * 60 + 30).as("hi"))
    val plan = RangeJoin.pointInInterval(p, "t", iv, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
