package graft

import graft.operators.Warehouse
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, attr) changelog: k1 changes a->a->b->b->a, k2 constant, k3
  // single row, k4 exercises null attribute states
  private val log = Seq(
    ("k1", 1L, Some("a")), ("k1", 2L, Some("a")), ("k1", 3L, Some("b")),
    ("k1", 4L, Some("b")), ("k1", 5L, Some("a")),
    ("k2", 1L, Some("x")), ("k2", 9L, Some("x")),
    ("k3", 7L, Some("solo")),
    ("k4", 1L, None), ("k4", 2L, Some("v")), ("k4", 3L, None)
  ).toDF("k", "seq", "attr")

  test("scd2 compacts unchanged runs and chains validity intervals") {
    val got = Warehouse.scd2(log, Seq("k"), Seq("seq"), Seq("attr"))
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4))).toSet
    assert(got == Set(
      ("k1", Some("a"), 1L, Some(3L), false),
      ("k1", Some("b"), 3L, Some(5L), false),
      ("k1", Some("a"), 5L, None, true),
      ("k2", Some("x"), 1L, None, true),
      ("k3", Some("solo"), 7L, None, true),
      // null is a state: null -> v -> null is three intervals
      ("k4", None, 1L, Some(2L), false),
      ("k4", Some("v"), 2L, Some(3L), false),
      ("k4", None, 3L, None, true)))
  }

  test("scd2 is deterministic under any input partitioning") {
    val a = Warehouse.scd2(log.repartition(1), Seq("k"), Seq("seq"), Seq("attr"))
      .orderBy("k", "valid_from").collect().toSeq
    val b = Warehouse.scd2(log.repartition(7), Seq("k"), Seq("seq"), Seq("attr"))
      .orderBy("k", "valid_from").collect().toSeq
    assert(a == b)
  }

  test("scd2 plans ONE exchange: both windows share partitioning and sort") {
    val plan = Warehouse.scd2(log, Seq("k"), Seq("seq"), Seq("attr"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("scd2 rejects reserved columns and empty column lists") {
    intercept[IllegalArgumentException] {
      Warehouse.scd2(log.withColumn("valid_from", lit(1)),
        Seq("k"), Seq("seq"), Seq("attr"))
    }
    intercept[IllegalArgumentException] {
      Warehouse.scd2(log, Seq("k"), Seq("seq"), Nil)
    }
  }

  private val oldSnap = Seq(
    ("k1", 10L, "a"), ("k2", 20L, "b"), ("k3", 30L, "c"), ("k5", 50L, "n")
  ).toDF("k", "v", "s")
  private val newSnap = Seq(
    ("k1", 10L, "a"),      // unchanged
    ("k2", 21L, "b"),      // changed (v)
    ("k4", 40L, "d"),      // added
    ("k5", 50L, "m")       // changed (s)
  ).toDF("k", "v", "s")

  test("snapshotDiff classifies added/removed/changed/unchanged with both payloads") {
    val got = Warehouse.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(4)))).toSet
    assert(got == Set(
      ("k1", "unchanged", Some(10L), Some(10L)),
      ("k2", "changed", Some(20L), Some(21L)),
      ("k3", "removed", Some(30L), None),
      ("k4", "added", None, Some(40L)),
      ("k5", "changed", Some(50L), Some(50L))))
  }

  test("snapshotDiff null payloads compare null-safe") {
    val o = Seq(("a", Option.empty[String]), ("b", Some("x"))).toDF("k", "p")
    val n = Seq(("a", Option.empty[String]), ("b", Option.empty[String])).toDF("k", "p")
    val got = Warehouse.snapshotDiff(o, n, Seq("k"))
      .select("k", "status").as[(String, String)].collect().toSet
    assert(got == Set(("a", "unchanged"), ("b", "changed")))
  }

  test("snapshotDiffSummary counts per status") {
    val got = Warehouse.snapshotDiffSummary(oldSnap, newSnap, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("unchanged" -> 1L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("snapshotDiff rejects mismatched column sets") {
    intercept[IllegalArgumentException] {
      Warehouse.snapshotDiff(oldSnap, newSnap.drop("s"), Seq("k"))
    }
  }

  test("pointInTime serves the version valid at each fact ts") {
    val dim = Warehouse.scd2(log, Seq("k"), Seq("seq"), Seq("attr"))
      .withColumnRenamed("k", "key")
    val facts = Seq(
      ("k1", 1L, 1),  // exactly at the first version's valid_from -> "a"
      ("k1", 2L, 2),  // inside [1,3) -> "a" (the compacted-away row 2 too)
      ("k1", 3L, 3),  // boundary: [3,5) opens AT 3 -> "b" (closed-open)
      ("k1", 9L, 4),  // after the last change -> current "a"
      ("k2", 0L, 5),  // before k2's first version -> null
      ("k9", 5L, 6)   // key absent from the dim -> null
    ).toDF("key", "seq", "fid")
    val got = Warehouse.pointInTime(facts, dim, "key", "seq", Seq("attr"))
      .select("fid", "asof_attr").as[(Int, Option[String])]
      .collect().toMap
    assert(got == Map(1 -> Some("a"), 2 -> Some("a"), 3 -> Some("b"),
      4 -> Some("a"), 5 -> None, 6 -> None))
  }

  test("pointInTime carries a genuinely-null dim attribute distinct from no-match") {
    // k4's state at seq 1 IS null (a recorded null state) — the fact at
    // seq 1 must read null because the VERSION says null, and the fact at
    // seq 2 must read "v": the version struct is carried atomically
    val dim = Warehouse.scd2(log, Seq("k"), Seq("seq"), Seq("attr"))
      .withColumnRenamed("k", "key")
    val facts = Seq(("k4", 1L, 1), ("k4", 2L, 2), ("k4", 3L, 3))
      .toDF("key", "seq", "fid")
    val got = Warehouse.pointInTime(facts, dim, "key", "seq", Seq("attr"))
      .select("fid", "asof_attr").as[(Int, Option[String])]
      .collect().toMap
    assert(got == Map(1 -> None, 2 -> Some("v"), 3 -> None))
  }

  test("abc: hand-computed Pareto classes and cumulative shares") {
    // measures 50, 30, 15, 5 (total 100): cum 50, 80, 95, 100 -> A A B C
    val rows = Seq.fill(5)(("p1", 10.0)) ++ Seq(("p2", 30.0)) ++
      Seq(("p3", 7.5), ("p3", 7.5)) ++ Seq(("p4", 5.0))
    val got = Warehouse.abcAnalysis(rows.toDF("part", "rev"), "part", "rev")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(3), r.getString(4)))).toMap
    assert(got("p1") == ((50.0, 50.0, "A")))
    assert(got("p2") == ((30.0, 80.0, "A"))) // boundary: <= 80 stays A
    assert(got("p3") == ((15.0, 95.0, "B")))
    assert(got("p4") == ((5.0, 100.0, "C")))
  }

  test("rfm: distinct metrics land each customer in its own quintile") {
    // customer i: i orders of amount i*10, latest ts i -> all scores = i
    val rows = (1 to 5).flatMap(i =>
      (1 to i).map(j => (s"c$i", i.toLong * 100 + j, i * 10.0)))
    val got = Warehouse.rfm(rows.toDF("cust", "ts", "amt"),
      "cust", "ts", "amt").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(7)))).toMap
    for (i <- 1 to 5) {
      val (rec, freq, mon, seg) = got(s"c$i")
      assert(rec == i.toLong * 100 + i && freq == i.toLong)
      assert(mon == i * i * 10.0)
      assert(seg == s"$i$i$i")
    }
  }

  test("rfm: mixed-null timestamps keep full frequency/monetary; all-null entities drop") {
    // c1: 3 orders, one with a null ts — frequency must stay 3 and
    // monetary must sum ALL amounts (aggregate-level null handling, not a
    // row filter); recency comes from the orderable rows. c2: every ts
    // null -> excluded. c3: plain control.
    val rows = Seq(
      ("c1", Some(100L), 10.0), ("c1", None, 20.0), ("c1", Some(50L), 30.0),
      ("c2", None, 99.0), ("c2", None, 1.0),
      ("c3", Some(200L), 5.0))
    val got = Warehouse.rfm(rows.toDF("c", "t", "a"), "c", "t", "a")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(!got.contains("c2"), "all-null-ts entity must be excluded")
    assert(got("c1") == ((100L, 3L, 60.0)),
      "null-ts rows still count toward frequency and monetary")
    assert(got("c3") == ((200L, 1L, 5.0)))
  }

  test("rfm: invariant under input partitioning") {
    val rows = (1 to 300).map(i => (s"c${i % 40}", i.toLong, (i % 13) * 2.0))
    def run(p: Int) = Warehouse.rfm(rows.toDF("c", "t", "a").repartition(p),
      "c", "t", "a").orderBy("entity").collect().toSeq
    assert(run(1) == run(9))
  }

  test("rfm: rank-derived tiles equal the global ntile(5) window exactly") {
    import org.apache.spark.sql.expressions.Window
    // heavy cross-entity ties on every metric + a non-multiple-of-5 entity
    // count, so the NTILE remainder rule and the entity tie-break are both
    // load-bearing
    val rows = (1 to 500).map(i => (s"c${i % 47}", (i % 11).toLong, (i % 7) * 3.0))
    val per = rows.toDF("c", "t", "a")
      .groupBy(col("c").cast("string").as("entity"))
      .agg(max(col("t").cast("long")).as("recency_ts"),
        count(lit(1)).as("frequency"),
        sum(col("a").cast("decimal(18,2)")).as("m"))
    def win(c: String) = ntile(5).over(
      Window.orderBy(col(c).asc, col("entity").asc)).cast("long")
    val expect = per.withColumn("r_score", win("recency_ts"))
      .withColumn("f_score", win("frequency"))
      .withColumn("m_score", win("m"))
      .select("entity", "r_score", "f_score", "m_score")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = Warehouse.rfm(rows.toDF("c", "t", "a"), "c", "t", "a").collect()
    assert(got.length == 47)
    got.foreach { r =>
      assert(expect(r.getString(0)) ==
        ((r.getLong(4), r.getLong(5), r.getLong(6))), s"entity ${r.getString(0)}")
    }
  }

  test("abc: deterministic under ties and partitioning") {
    val rows = (1 to 300).map(i => (s"e${i % 40}", (i % 9) + 1.0))
    def run(p: Int) = Warehouse.abcAnalysis(rows.toDF("e", "v").repartition(p),
      "e", "v").orderBy("entity").collect().toSeq
    assert(run(1) == run(11))
  }
}
