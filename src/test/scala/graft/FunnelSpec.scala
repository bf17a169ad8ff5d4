package graft

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, ts): u1 completes A->B->C in order; u2 does B before A so
  // only A counts; u3 stops at B; u4 re-does A late but their FIRST A
  // anchors the funnel (earliest-valid-completion), so the late B counts;
  // u5 has B at the exact same ts as A — strictly-after excludes it
  private val ev = Seq(
    ("u1", "A", 10L), ("u1", "B", 20L), ("u1", "C", 30L),
    ("u2", "B", 5L), ("u2", "A", 50L),
    ("u3", "A", 1L), ("u3", "B", 2L),
    ("u4", "A", 100L), ("u4", "A", 5L), ("u4", "B", 40L),
    ("u5", "A", 7L), ("u5", "B", 7L)
  ).toDF("u", "et", "ts")

  test("strictly ordered funnel counts users per step") {
    val got = Funnel.funnelSteps(ev, "u", "et", "ts", Seq("A", "B", "C"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    // A: u1..u5 all have an A; B after A: u1, u3, u4; C after that B: u1
    assert(got == Set((0, "A", 5L), (1, "B", 3L), (2, "C", 1L)))
  }

  test("funnel anchors on the EARLIEST qualifying completion per step") {
    // u4's A at ts=5 (not 100) anchors step 0, so B at 40 qualifies
    val got = Funnel.funnelSteps(
      ev.filter($"u" === "u4"), "u", "et", "ts", Seq("A", "B"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("A" -> 1L, "B" -> 1L))
  }

  test("funnel result is invariant to partitioning") {
    val a = Funnel.funnelSteps(ev.repartition(1), "u", "et", "ts",
      Seq("A", "B", "C")).orderBy("step").collect().toSeq
    val b = Funnel.funnelSteps(ev.repartition(7), "u", "et", "ts",
      Seq("A", "B", "C")).orderBy("step").collect().toSeq
    assert(a == b)
  }

  test("retention cohorts bucket by first-seen and count distinct users") {
    // bucket size 10: u1 first at b0, active b0,b1,b3; u2 first at b1,
    // active b1; u3 first at b0 (two events same bucket dedup), active b0,b1
    val ev2 = Seq(
      ("u1", 1L), ("u1", 12L), ("u1", 33L),
      ("u2", 15L),
      ("u3", 2L), ("u3", 9L), ("u3", 11L)
    ).toDF("u", "ts")
    val got = Funnel.retentionCohorts(ev2, "u", "ts", 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("retention bucketing is exact integer division at nanosecond-epoch magnitude") {
    // 1.7e18 ns is beyond double's exact range: a float path would misbucket
    val day = 86400000000000L
    val t0 = 1700000000000000000L
    val ev3 = Seq(("u", t0), ("u", t0 + day - 1L), ("u", t0 + day)).toDF("u", "ts")
    val got = Funnel.retentionCohorts(ev3, "u", "ts", day)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // first two land in the same bucket, third exactly one bucket later
    assert(got == Map(0L -> 1L, 1L -> 1L))
  }

  test("pathNgrams: hand-computed top paths, ordered by count then path") {
    val ev = Seq((1L, "A", 1L, 1L), (1L, "B", 2L, 2L), (1L, "C", 3L, 3L),
      (1L, "D", 4L, 4L), (2L, "A", 1L, 5L), (2L, "B", 2L, 6L),
      (2L, "C", 3L, 7L)).toDF("u", "t", "ts", "id")
    val rows = Funnel.pathNgrams(ev, "u", "t", "ts", "id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("A>B>C", 2L), ("B>C>D", 1L)))
  }

  test("retentionHalfLife: exact halving curve recovers half-life 1 bucket") {
    val day = 86400000000000L
    // all users cohort 0; active sets halve per offset: 64, 32, 16, 8
    val rows = (1 to 64).map(u => (u.toLong, 5L)) ++
      (1 to 32).map(u => (u.toLong, day + 5L)) ++
      (1 to 16).map(u => (u.toLong, 2 * day + 5L)) ++
      (1 to 8).map(u => (u.toLong, 3 * day + 5L))
    val Array(r) = Funnel.retentionHalfLife(rows.toDF("u", "ts"), "u", "ts",
      day).collect()
    assert(r.getLong(0) == 4)
    assert(math.abs(r.getDouble(1) - -0.693147) < 1e-5) // slope = -ln 2
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-4) // half-life in buckets
  }

  test("retentionHalfLife: a non-decaying curve yields no fit row") {
    val day = 86400000000000L
    val rows = (1 to 10).flatMap(u =>
      (0 to 5).map(o => (u.toLong, o * day + 1L))) // everyone always active
    assert(Funnel.retentionHalfLife(rows.toDF("u", "ts"), "u", "ts", day)
      .collect().isEmpty) // slope rounds to 0, filtered
  }

  test("timeToConvert: hand-computed latency percentiles and cvr") {
    val h = 3600000000000L
    val t0 = 1700000000000000000L
    // converted: 2h, 5h, 10h; one signup never converts; one orphan purchase
    val ev = Seq((1L, "signup", t0), (1L, "purchase", t0 + 2 * h),
      (2L, "signup", t0), (2L, "purchase", t0 + 5 * h),
      (3L, "signup", t0), (3L, "purchase", t0 + 10 * h),
      (4L, "signup", t0),
      (5L, "purchase", t0 + h)).toDF("u", "t", "ts")
    val rows = Funnel.timeToConvert(ev, "u", "t", "ts", "signup", "purchase",
      Seq(0.5, 0.9)).orderBy("p").collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(0) == 0.5 && rows(0).getDouble(2) == 5.0)
    assert(rows(1).getDouble(0) == 0.9 && rows(1).getDouble(2) == 10.0)
    assert(rows(0).getLong(3) == 4 && rows(0).getLong(4) == 3)
    assert(rows(0).getDouble(5) == 0.75)
  }

  test("timeToConvert: only the FIRST from/to pair counts; pre-signup ignored") {
    val h = 3600000000000L
    val t0 = 1700000000000000000L
    // purchase BEFORE signup ignored; second signup ignored; first
    // post-signup purchase (3h) wins over the later one (8h)
    val ev = Seq((1L, "purchase", t0 - 5 * h), (1L, "signup", t0),
      (1L, "signup", t0 + h), (1L, "purchase", t0 + 3 * h),
      (1L, "purchase", t0 + 8 * h)).toDF("u", "t", "ts")
    val rows = Funnel.timeToConvert(ev, "u", "t", "ts", "signup", "purchase",
      Seq(0.5)).collect()
    assert(rows.length == 1 && rows(0).getDouble(2) == 3.0)
  }

  test("markov: hand-computed transition counts and probabilities") {
    // u1: A B A(end); u2: A B(end)  =>  A->B:2, B->A:1, A->end:1, B->end:1
    val ev = Seq((1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L),
      (2L, "A", 10L, 4L), (2L, "B", 20L, 5L)).toDF("u", "t", "ts", "id")
    val got = Funnel.markovTransitions(ev, "u", "t", "ts", "id").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      ("A", "B") -> ((2L, 0.666667)), ("A", "(end)") -> ((1L, 0.333333)),
      ("B", "A") -> ((1L, 0.5)), ("B", "(end)") -> ((1L, 0.5))))
  }

  test("markov: probabilities row-normalize to 1 on the fixture shape") {
    val ev = (1 to 200).map(i =>
      (i % 13L, Seq("v", "c", "p")(i % 3), i * 100L, i.toLong))
      .toDF("u", "t", "ts", "id")
    val sums = Funnel.markovTransitions(ev, "u", "t", "ts", "id").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(3)).sum).toMap
    sums.values.foreach(s => assert(math.abs(s - 1.0) < 1e-4))
  }

  test("markov: simultaneous events sequence by id (deterministic ties)") {
    val ev = Seq((1L, "X", 10L, 2L), (1L, "Y", 10L, 1L)).toDF("u", "t", "ts", "id")
    val got = Funnel.markovTransitions(ev, "u", "t", "ts", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // id 1 (Y) first, then X, then end — never X->Y
    assert(got == Set(("Y", "X"), ("X", "(end)")))
  }
}
