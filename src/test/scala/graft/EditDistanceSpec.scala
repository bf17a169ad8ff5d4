package graft

import graft.operators.EditDistance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def brute(strs: DataFrame, maxDist: Int): Set[(Long, Long, Int)] = {
    val s = strs.select(col("id"), col("s"))
    s.alias("a").join(s.alias("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def got(strs: DataFrame, maxDist: Int, q: Int = 2): Set[(Long, Long, Int)] =
    EditDistance.editDistancePairs(strs, "id", "s", maxDist, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("matches brute force on a hand fixture (substitution, insert, delete)") {
    val strs = Seq(
      (1L, "sparkly engine"), (2L, "sparkle engine"), (3L, "sparkly enginee"),
      (4L, "spark engine"), (5L, "totally different"), (6L, "sparkly engine")
    ).toDF("id", "s")
    for (d <- 0 to 2)
      assert(got(strs, d) == brute(strs, d), s"maxDist=$d")
  }

  test("short strings (under the prefix floor) are not lost") {
    // all shorter than q*(d+1): the gram prefix bound degenerates, the
    // short-string block must still find every pair
    val strs = Seq((1L, "ab"), (2L, "ac"), (3L, "b"), (4L, "ab"), (5L, "xy"))
      .toDF("id", "s")
    assert(got(strs, 1) == brute(strs, 1))
  }

  test("mixed short and long strings: cross pairs survive the routing") {
    val strs = Seq(
      (1L, "abc"), (2L, "abcd"), (3L, "ab"), (4L, "abcde"), (5L, "zzzz")
    ).toDF("id", "s")
    for (d <- 1 to 2)
      assert(got(strs, d) == brute(strs, d), s"maxDist=$d")
  }

  test("randomized: filter stack loses no pair at q=2 and q=3") {
    // deterministic pseudo-random word soup with heavy near-dup structure
    val vocab = Seq("red", "blue", "tan", "teal", "plum", "mint")
    val strs = (0L until 120L).map { i =>
      val base = (0 until 3).map(j => vocab(((i * 7 + j * 13) % 6).toInt))
      val tweak = if (i % 3 == 0) base.mkString(" ")
      else if (i % 3 == 1) base.mkString(" ") + "s"
      else base.mkString(" ").replace('e', 'a')
      (i, tweak)
    }.toDF("id", "s")
    val want = brute(strs, 1)
    assert(got(strs, 1, q = 2) == want)
    assert(got(strs, 1, q = 3) == want)
  }

  test("result is invariant to partitioning") {
    val strs = (0L until 60L).map(i => (i, s"item ${i % 20} v${i % 3}"))
      .toDF("id", "s")
    val a = got(strs.repartition(1), 1)
    val b = got(strs.repartition(11), 1)
    assert(a == b && a == brute(strs, 1))
  }

  test("maxDist=0 degenerates to exact-duplicate pairs") {
    val strs = Seq((1L, "same"), (2L, "same"), (3L, "other"), (4L, "same"))
      .toDF("id", "s")
    assert(got(strs, 0) == Set((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)))
  }
}
