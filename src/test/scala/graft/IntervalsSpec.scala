package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // k1: [1,5) [3,7) overlap; [7,9) touches -> one island [1,9); [20,25)
  //     separate. k2: [0,10) contains [2,3) and zero-length [5,5).
  // k3: single interval. k4: null bounds dropped.
  private val iv = Seq(
    ("k1", 1L, 5L), ("k1", 3L, 7L), ("k1", 7L, 9L), ("k1", 20L, 25L),
    ("k2", 0L, 10L), ("k2", 2L, 3L), ("k2", 5L, 5L),
    ("k3", 4L, 6L)
  ).toDF("k", "s", "e")

  test("coalesce merges overlapping, touching, contained, zero-length intervals") {
    val got = Intervals.coalesce(iv, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("k1", 1L, 9L, 3L), ("k1", 20L, 25L, 1L),
      ("k2", 0L, 10L, 3L),
      ("k3", 4L, 6L, 1L)))
  }

  test("a gap of one unit separates islands; adjacency does not") {
    val d = Seq(("a", 1L, 2L), ("a", 2L, 3L), ("a", 4L, 5L)).toDF("k", "s", "e")
    val got = Intervals.coalesce(d, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 3L, 2L), ("a", 4L, 5L, 1L)))
  }

  test("null-bounded intervals are rejected from the merge, not islands of their own") {
    val d = Seq(("a", Some(1L), Some(3L)), ("a", None, Some(9L)),
      ("a", Some(5L), None)).toDF("k", "s", "e")
    val got = Intervals.coalesce(d, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 3L, 1L)))
  }

  test("coalesce is deterministic under any input partitioning") {
    val a = Intervals.coalesce(iv.repartition(1), Seq("k"), "s", "e")
      .orderBy("k", "island_start").collect().toSeq
    val b = Intervals.coalesce(iv.repartition(7), Seq("k"), "s", "e")
      .orderBy("k", "island_start").collect().toSeq
    assert(a == b)
  }

  test("coalesce plans ONE exchange: windows + island aggregate share the key partitioning") {
    val plan = Intervals.coalesce(iv, Seq("k"), "s", "e")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("coveredDuration sums island lengths per key") {
    val got = Intervals.coveredDuration(iv, Seq("k"), "s", "e")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("k1", 13L, 2L), ("k2", 10L, 1L), ("k3", 2L, 1L)))
  }

  test("coalesce rejects reserved columns") {
    intercept[IllegalArgumentException] {
      Intervals.coalesce(iv.withColumn("__island", lit(1)), Seq("k"), "s", "e")
    }
  }
}
