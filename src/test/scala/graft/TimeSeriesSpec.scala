package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions.col

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleFFill grids, picks the latest obs per bucket, forward-fills") {
    val df = Seq(
      ("a", 5L, 1.0), ("a", 25L, 2.0), ("a", 27L, 3.0), ("a", 45L, 9.0),
      ("b", 12L, 4.0)
    ).toDF("k", "ts", "v")
    val got = TimeSeries.resampleFFill(df, Seq("k"), "ts", "v", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == Set(
      ("a", 0L, 1.0, 1L), ("a", 1L, 1.0, 0L), ("a", 2L, 3.0, 2L),
      ("a", 3L, 3.0, 0L), ("a", 4L, 9.0, 1L),
      ("b", 1L, 4.0, 1L)))
  }

  test("exact-ts ties break on the larger value (max-struct semantics)") {
    val df = Seq(("a", 5L, 1.0), ("a", 5L, 7.0)).toDF("k", "ts", "v")
    val got = TimeSeries.resampleFFill(df, Seq("k"), "ts", "v", 10L)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 7.0, 2L)))
  }

  test("rollingAnomaly: z against the trailing window, null until full/flat") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 5.0), ("a", 6L, 100.0)
    ).toDF("k", "bucket", "v")
    val got = TimeSeries.rollingAnomaly(df, Seq("k"), "bucket", "v", 3)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))
    def exp(x: Double, hist: Seq[Double]): Double = {
      val m = hist.sum / hist.length
      val v = hist.map(h => h * h).sum / hist.length - m * m
      BigDecimal((x - m) / math.sqrt(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.take(3).forall(t => t._2.isEmpty && t._3.isEmpty))
    assert(got(3) == ((4L, Some(exp(4.0, Seq(1, 2, 3))), Some(false))))
    assert(got(4) == ((5L, Some(exp(5.0, Seq(2, 3, 4))), Some(false))))
    assert(got(5) == ((6L, Some(exp(100.0, Seq(3, 4, 5))), Some(true))))
  }

  test("flat history yields no z-score (variance 0 is not an anomaly basis)") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 2.0), ("a", 3L, 2.0),
      ("a", 4L, 50.0)).toDF("k", "bucket", "v")
    val got = TimeSeries.rollingAnomaly(df, Seq("k"), "bucket", "v", 3)
      .filter($"bucket" === 4L).collect()
    assert(got.head.isNullAt(3) && got.head.isNullAt(4))
  }

  test("composition is partitioning-invariant") {
    val df = (1L to 200L).map(i =>
      ("k" + (i % 3), i * 7L, (i % 13).toDouble)).toDF("k", "ts", "v")
    def run(parts: Int) = {
      val grid = TimeSeries.resampleFFill(df.repartition(parts),
        Seq("k"), "ts", "v", 20L)
      TimeSeries.rollingAnomaly(grid, Seq("k"), "bucket", "v", 4)
        .orderBy("k", "bucket").collect().toSeq
    }
    assert(run(1) == run(7))
  }

  test("seasonalAnomaly: spike flagged against its own slot, peers are not") {
    val hour = 3600000000000L
    // slot (k, hod 0): twenty 10.0s + one 100.0 across different days
    val rows = (0 until 20).map(d => (d.toLong, "k", d * 24L * hour, 10.0)) :+
      ((99L, "k", 20L * 24 * hour, 100.0))
    val got = TimeSeries.seasonalAnomaly(rows.toDF("id", "k", "ts", "v"),
      "k", "ts", "v", "id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(99L))
    assert(got.head.getLong(2) == 0L) // the hod-0 slot
    assert(got.head.getDouble(6) > 3.0) // z beyond the threshold
  }

  test("seasonalAnomaly: thin slots (n < minN) never flag") {
    val hour = 3600000000000L
    val rows = Seq((1L, "k", hour, 1.0), (2L, "k", 25L * hour, 1000.0))
    assert(TimeSeries.seasonalAnomaly(rows.toDF("id", "k", "ts", "v"),
      "k", "ts", "v", "id").collect().isEmpty)
  }

  test("seasonalAnomaly: a daily-rhythm metric yields no false flags") {
    val hour = 3600000000000L
    // value depends only on hour of day: every slot has zero variance
    val rows = (0 until 480).map { i =>
      (i.toLong, "k", i * hour, ((i % 24) * 10).toDouble)
    }
    assert(TimeSeries.seasonalAnomaly(rows.toDF("id", "k", "ts", "v"),
      "k", "ts", "v", "id").collect().isEmpty) // sd gate: no signal, no flag
  }

  test("decayedTopK: recent burst outranks a larger stale total") {
    val hour = 3600000000000L
    val t0 = 1700000000000000000L
    // item 1: 10 events now; item 2: 100 events 10 half-lives ago
    // (weight 0.000977 each -> decayed score 0.0977 << 10)
    val ev = ((1 to 10).map(i => ("g", 1L, t0)) ++
      (1 to 100).map(i => ("g", 2L, t0 - 10 * hour))).toDF("grp", "item", "ts")
    val rows = TimeSeries.decayedTopK(ev, "grp", "item", "ts",
      halfLifeHours = 1, k = 10).orderBy("rank").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(rows(0).getDouble(2) == 10.0)
    assert(rows(1).getDouble(2) == 0.0977) // 100 * round(2^-10, 6)
  }

  test("decayedTopK: k bounds output; ties break by item ascending") {
    val t0 = 1700000000000000000L
    val ev = (1 to 50).map(i => ("g", i.toLong, t0)).toDF("grp", "item", "ts")
    val rows = TimeSeries.decayedTopK(ev, "grp", "item", "ts", 24, 5).collect()
    assert(rows.length == 5)
    assert(rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("decayFold: two folded batches equal the one-shot scores exactly") {
    val hour = 3600000000000L
    val t0 = 1700000000000000000L
    // hour-aligned events, decay exponents <= 6: the exact-equality regime
    val b1 = Seq(("g", 1L, t0), ("g", 1L, t0 + hour), ("g", 2L, t0))
      .toDF("grp", "item", "ts")
    val b2 = Seq(("g", 1L, t0 + 3 * hour), ("g", 3L, t0 + 3 * hour))
      .toDF("grp", "item", "ts")
    val empty = Seq.empty[(String, Long, java.math.BigDecimal, Long)]
      .toDF("grp", "item", "score", "asof")
      .select(col("grp"), col("item"),
        col("score").cast("decimal(38,6)").as("score"), col("asof"))
    val folded = TimeSeries.decayFold(
      TimeSeries.decayFold(empty, b1, "grp", "item", "ts", 1),
      b2, "grp", "item", "ts", 1)
    val oneShot = TimeSeries.decayedTopK(b1.unionByName(b2), "grp", "item",
      "ts", halfLifeHours = 1, k = 10)
    val f = folded.collect()
      .map(r => r.getLong(1) -> r.getDecimal(2).doubleValue()).toMap
    val o = oneShot.collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(f == o, s"folded $f vs one-shot $o")
    // hand value: item 1 = 2^-3 + 2^-2 + 2^0 = 1.375 at asof t0+3h
    assert(f(1L) == 1.375)
  }

  test("decayFold: items decayed below the floor leave the state") {
    val hour = 3600000000000L
    val t0 = 1700000000000000000L
    val st = Seq(("g", 7L, java.math.BigDecimal.valueOf(0.000002), t0))
      .toDF("grp", "item", "score", "asof")
      .select(col("grp"), col("item"),
        col("score").cast("decimal(38,6)").as("score"), col("asof"))
    val batch = Seq(("g", 8L, t0 + 10 * hour)).toDF("grp", "item", "ts")
    val out = TimeSeries.decayFold(st, batch, "grp", "item", "ts", 1)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(8L)) // item 7 aged to ~0 and fell out
  }

  test("decayedTopK: partitioning-invariant (decimal weight sums)") {
    val hour = 3600000000000L
    val t0 = 1700000000000000000L
    val ev = (1 to 400).map(i =>
      (s"g${i % 3}", i % 17L, t0 - (i % 50) * hour)).toDF("grp", "item", "ts")
    def run(p: Int) = TimeSeries.decayedTopK(ev.repartition(p), "grp", "item",
      "ts", 12, 5).orderBy("grp", "rank").collect().toSeq
    assert(run(1) == run(13))
  }

  test("changepoint: hand-computed step, flat series, earliest-tie rule") {
    // step 0,0,0,10,10 (T=20): D_k = |5*S_k - k*20| peaks at k=3 (60) -> cp ts=3
    val rows = Seq(("a", 1L, 1L, 0.0), ("a", 2L, 2L, 0.0), ("a", 3L, 3L, 0.0),
      ("a", 4L, 4L, 10.0), ("a", 5L, 5L, 10.0)) ++
      (1 to 4).map(i => ("b", i.toLong, 10L + i, 5.0)) // flat: all D_k = 0
    val got = TimeSeries.changepoint(rows.toDF("k", "ts", "id", "v"),
      "k", "ts", "v", "id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(6)))).toMap
    assert(got("a") == ((5L, 3L, 12.0, 0.0, 10.0))) // cusum = 60/5
    assert(got("b") == ((4L, 1L, 0.0, 5.0, 0.0)))   // flat -> first ts, shift 0
  }

  test("interarrivalKs: hand-computed constant-gap series; flat key dropped") {
    // ts 0,1,2,3 -> gaps 1,1,1: lambda=1/ns, F(1)=1-1/e; KS = F(1) (at k=1
    // the empirical CDF below the smallest gap is 0)
    val rows = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L), ("a", 3L, 4L),
      ("b", 5L, 5L), ("b", 5L, 6L)) // b: single zero gap -> sg=0, dropped
      .toDF("k", "ts", "id")
    val got = TimeSeries.interarrivalKs(rows, "k", "ts", "id").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a"))
    val r = got.head
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(3) == math.rint((1.0 - math.exp(-1.0)) * 1e6) / 1e6)
    assert(!r.getBoolean(5)) // 0.632 < 1.36/sqrt(3) = 0.785
  }

  test("interarrivalKs: exponential-ish gaps score low, batchy gaps high") {
    // geometric-ish spread vs all-mass-at-two-points
    val smooth = (1 to 200).scanLeft(0L)((t, i) => t + (i % 7 + 1) * 100L)
      .zipWithIndex.map { case (t, i) => ("s", t, i.toLong) }
    val batchy = (1 to 200).scanLeft(0L)((t, i) =>
      t + (if (i % 20 == 0) 100000L else 1L))
      .zipWithIndex.map { case (t, i) => ("b", t, i.toLong) }
    val got = TimeSeries.interarrivalKs((smooth ++ batchy).toDF("k", "ts", "id"),
      "k", "ts", "id").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("b") > got("s"))
    assert(got("b") > 0.5) // two-point mass is nowhere near exponential
  }

  test("changepoint: invariant under input partitioning") {
    val rows = (1 to 500).map(i => (s"k${i % 4}", (i * 7).toLong, i.toLong,
      if (i % 4 == 0 && i > 250) 9.0 else (i % 5).toDouble))
    def run(p: Int) = TimeSeries.changepoint(
      rows.toDF("k", "ts", "id", "v").repartition(p), "k", "ts", "v", "id")
      .orderBy("key").collect().toSeq
    assert(run(1) == run(11))
  }
}
