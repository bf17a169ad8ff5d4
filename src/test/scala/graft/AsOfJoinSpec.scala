package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: latest prior state per key, inclusive ties, null when none") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 15L, "c"),
      (2L, 5L, "d"), (3L, 100L, "e"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 7.0), (1L, 16L, 8.0), (2L, 6L, 9.0))
      .toDF("k", "ts", "p")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(got == Set(
      (1L, 10L, "a", 7.0),   // inclusive tie: state at same ts visible
      (1L, 20L, "b", 8.0),   // latest of the two priors
      (1L, 15L, "c", 7.0),   // out-of-order left row gets its own prior
      (2L, 5L, "d", null),   // right state only arrives later
      (3L, 100L, "e", null)  // key with no state at all
    ), s"got $got")
  }

  test("matched row with NULL payload stays NULL (no stale carry, no mixing)") {
    val left = Seq((1L, 20L, "x")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 5L, Some(7.0), Some(1.0)),
      (1L, 10L, None, Some(2.0))) // latest row: a=NULL, b=2.0
      .toDF("k", "ts", "a", "b")
    val r = AsOfJoin.asOf(left, right, "k", "ts", Seq("a", "b")).collect().head
    assert(r.isNullAt(3), "asof_a must be the matched row's NULL, not the older 7.0")
    assert(r.getDouble(4) == 2.0)
  }

  test("NULL keys never match (SQL equality semantics)") {
    val left = Seq((Option.empty[Long], 20L, "x"), (Option(1L), 20L, "y"))
      .toDF("k", "ts", "tag")
    val right = Seq((Option.empty[Long], 10L, 5.0), (Option(1L), 10L, 6.0))
      .toDF("k", "ts", "p")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("p")).collect()
      .map(r => (r.getString(2), if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(got == Set(("x", null), ("y", 6.0)))
  }

  test("reserved column names are rejected fast") {
    val bad = Seq((1L, 2L, 3L)).toDF("k", "ts", "asof_p")
    val right = Seq((1L, 1L, 1.0)).toDF("k", "ts", "p")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(bad, right, "k", "ts", Seq("p"))
    }
  }

  test("asof join keeps every left row and all left columns") {
    val left = (0L until 50L).map(i => (i % 5, i, i * 1.5)).toDF("k", "ts", "x")
    val right = Seq((0L, 10L, 1.0), (1L, 0L, 2.0)).toDF("k", "ts", "p")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("p"))
    assert(out.count() == 50)
    assert(out.columns.toSeq == Seq("k", "ts", "x", "asof_p"))
  }
}
