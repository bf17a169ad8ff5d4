package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("exact line: slope/intercept recovered, corr = 1") {
    val df = (0L until 50L).map(x => ("g", x, 3 * x + 7)).toDF("grp", "x", "y")
    val Array(r) = Stats.trendPerGroup(df, "grp", "x", "y").collect()
    assert(r.getLong(1) == 50)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 7.0 && r.getDouble(4) == 1.0)
  }

  test("anti-correlated line: slope negative, corr = -1") {
    val df = (0L until 30L).map(x => ("g", x, 100 - 2 * x)).toDF("grp", "x", "y")
    val Array(r) = Stats.trendPerGroup(df, "grp", "x", "y").collect()
    assert(r.getDouble(2) == -2.0 && r.getDouble(4) == -1.0)
  }

  test("hand-computed noisy slope; degenerate groups dropped") {
    // y = (0, 2, 1, 3): n=4, sx=6, sy=6, sxy=13, sxx=14 -> slope = (52-36)/(56-36) = 0.8
    val noisy = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 1L), ("a", 3L, 3L),
      ("onepoint", 5L, 5L), // n < 2: dropped
      ("novar", 4L, 1L), ("novar", 4L, 9L)) // zero x-variance: dropped
      .toDF("grp", "x", "y")
    val rows = Stats.trendPerGroup(noisy, "grp", "x", "y").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("a"))
    assert(rows("a") == ((0.8, 0.3)))
  }

  test("constant y: corr reported 0, slope 0") {
    val df = (0L until 10L).map(x => ("g", x, 42L)).toDF("grp", "x", "y")
    val Array(r) = Stats.trendPerGroup(df, "grp", "x", "y").collect()
    assert(r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("bit-identical across partitionings (integer sufficient statistics)") {
    val df = (0 until 3000).map { i =>
      (s"g${i % 5}", i.toLong % 371, (i.toLong * 2654435761L) % 997)
    }.toDF("grp", "x", "y")
    val a = Stats.trendPerGroup(df.repartition(1), "grp", "x", "y")
      .orderBy("grp").collect().toSeq
    val b = Stats.trendPerGroup(df.repartition(23), "grp", "x", "y")
      .orderBy("grp").collect().toSeq
    assert(a == b && a.size == 5)
  }

  test("exact quantiles: match the sorted-array order statistics") {
    val rnd = new scala.util.Random(41)
    val vals = (1 to 5000).map(_ => rnd.nextInt(500) / 7.0) // heavy ties
    val df = vals.map(Tuple1(_)).toDF("value")
    val ps = Seq(0.01, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = Stats.exactQuantiles(df, "value", ps, buckets = 64)
      .orderBy("p").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    val sorted = vals.sorted
    ps.zip(got).foreach { case (p, (gp, k, v)) =>
      assert(gp == p)
      assert(k == math.ceil(p * vals.length).toLong)
      assert(v == sorted((k - 1).toInt), s"p=$p")
    }
  }

  test("exact quantiles: all-equal, single-row, and empty inputs") {
    val flat = Seq.fill(10)(Tuple1(3.25)).toDF("value")
    val g = Stats.exactQuantiles(flat, "value", Seq(0.5)).collect().head
    assert(g.getDouble(2) == 3.25)
    val one = Seq(Tuple1(7.0)).toDF("value")
    assert(Stats.exactQuantiles(one, "value", Seq(0.5, 1.0)).collect()
      .forall(_.getDouble(2) == 7.0))
    val empty = Seq.empty[Tuple1[Double]].toDF("value")
    assert(Stats.exactQuantiles(empty, "value", Seq(0.5)).collect().isEmpty)
  }

  test("exact quantiles: partitioning-invariant, bucket-count-invariant") {
    val vals = (1 to 2000).map(i => ((i * 37) % 997).toDouble)
    val df = vals.map(Tuple1(_)).toDF("value")
    val a = Stats.exactQuantiles(df.repartition(1), "value", Seq(0.5, 0.9), 16)
      .orderBy("p").collect().toSeq
    val b = Stats.exactQuantiles(df.repartition(13), "value", Seq(0.5, 0.9), 512)
      .orderBy("p").collect().toSeq
    assert(a == b)
  }

  test("grouped quantiles: every group matches its own sorted-array statistics") {
    val rnd = new scala.util.Random(43)
    val rows = (1 to 4000).map { _ =>
      val g = s"g${rnd.nextInt(5)}"
      (g, rnd.nextInt(300) / 3.0) // heavy ties
    }
    val df = rows.toDF("grp", "v")
    val ps = Seq(0.1, 0.5, 0.9, 1.0)
    val got = Stats.exactQuantilesPerGroup(df, "grp", "v", ps, buckets = 32)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      ps.foreach { p =>
        val k = math.ceil(p * sorted.length).toLong
        assert(got((g, p)) == ((k, sorted((k - 1).toInt))), s"grp=$g p=$p")
      }
    }
    assert(got.size == 5 * ps.size)
  }

  test("grouped quantiles: constant group, singleton group, partition invariance") {
    val df = (Seq.fill(20)(("flat", 4.5)) ++ Seq(("one", 9.0)) ++
      (1 to 50).map(i => ("spread", i.toDouble))).toDF("grp", "v")
    def run(p: Int, b: Int) =
      Stats.exactQuantilesPerGroup(df.repartition(p), "grp", "v",
        Seq(0.5, 1.0), b).orderBy("grp", "p").collect().toSeq
    val a = run(1, 16)
    assert(a == run(9, 512))
    val m = a.map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    assert(m(("flat", 0.5)) == 4.5 && m(("flat", 1.0)) == 4.5)
    assert(m(("one", 0.5)) == 9.0 && m(("one", 1.0)) == 9.0)
    assert(m(("spread", 0.5)) == 25.0 && m(("spread", 1.0)) == 50.0)
  }

  test("equi-depth histogram: equal counts, exact boundaries, tie collapse") {
    // 1..800: 8 buckets of 100 rows, boundary i*100
    val df = (1 to 800).map(i => Tuple1(i.toDouble)).toDF("v")
    val got = Stats.equiDepthHistogram(df, "v", 8).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == (1 to 8).map(i => (i.toLong, i * 100.0, 100L)))
    // heavy ties: 90% of rows share one value -> that value's bucket takes
    // them ALL, duplicate boundaries read as honest zero-count buckets
    val skew = (Seq.fill(900)(5.0) ++ (1 to 100).map(_ + 10.0))
      .map(Tuple1(_)).toDF("v")
    val s = Stats.equiDepthHistogram(skew, "v", 4).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(s.map(_._3).sum == 1000L)
    assert(s.head == ((1L, 5.0, 900L)), s.toString) // all ties in bucket 1
    assert(s.count(_._3 == 0L) >= 1) // the duplicate-boundary buckets
  }

  test("robust outliers: a whale is flagged and cannot hide itself") {
    val base = (1 to 99).map(i => ("a", i.toLong, (i % 11).toDouble + 10.0))
    val whale = ("a", 1000L, 1e6)
    val got = Stats.robustOutliers((base :+ whale).toDF("g", "id", "v"),
      "g", "v", "id").collect()
    assert(got.map(_.getLong(1)).toSet == Set(1000L), "only the whale flags")
    // no-spread group (MAD = 0): no flags, even for a far value
    val flat = (Seq.fill(50)(("b", 1L, 7.0)) :+ (("b", 2L, 999.0))).toDF("g", "id", "v")
    assert(Stats.robustOutliers(flat, "g", "v", "id").collect().isEmpty)
  }

  test("mad: hand-computed median/MAD; a planted whale cannot move either") {
    // 1..9: median 5 (ceil-rank), deviations 0..4 -> MAD = ceil-rank median 2
    val base = (1 to 9).map(i => ("a", i.toDouble))
    val Array(r) = Stats.madPerGroup(base.toDF("grp", "v"), "grp", "v").collect()
    assert(r.getLong(1) == 9 && r.getDouble(2) == 5.0 && r.getDouble(3) == 2.0)
    // replace the top value with a whale: median and MAD are unchanged
    val whale = base.init :+ (("a", 1e9))
    val Array(w) = Stats.madPerGroup(whale.toDF("grp", "v"), "grp", "v").collect()
    assert(w.getDouble(2) == 5.0 && w.getDouble(3) == 2.0)
  }

  test("ab test: hand-computed z on a known split; equal rates read z = 0") {
    // control: 80/100 success; treatment: 60/100: p̂ = .7
    // z = 0.2 / sqrt(.7*.3*(1/100+1/100)) = 0.2/0.0648074 = 3.086067
    val rows = (1 to 100).map(i => ("control", if (i <= 80) 1L else 0L)) ++
      (1 to 100).map(i => ("treatment", if (i <= 60) 1L else 0L))
    val r = Stats.twoProportionZTest(rows.toDF("grp", "ok"), "grp", "ok")
      .collect().head
    assert(r.getAs[String]("group_a") == "control")
    assert(r.getAs[Double]("p_a") == 0.8 && r.getAs[Double]("p_b") == 0.6)
    assert(r.getAs[Double]("diff") == 0.2)
    assert(math.abs(r.getAs[Double]("z") - 3.086067) < 1e-6)
    assert(r.getAs[Boolean]("significant"))
    val flat = (1 to 50).flatMap(i =>
      Seq(("a", (i % 2).toLong), ("b", (i % 2).toLong)))
    val fr = Stats.twoProportionZTest(flat.toDF("grp", "ok"), "grp", "ok")
      .collect().head
    assert(fr.getAs[Double]("z") == 0.0 && !fr.getAs[Boolean]("significant"))
  }

  test("ab test: single-group input yields no row; partitioning-invariant") {
    val one = Seq(("only", 1L), ("only", 0L)).toDF("grp", "ok")
    assert(Stats.twoProportionZTest(one, "grp", "ok").collect().isEmpty)
    val rows = (1 to 300).map(i =>
      (if (i % 2 == 0) "x" else "y", (i % 3 == 0).compareTo(false).toLong))
    val df = rows.toDF("grp", "ok")
    val a = Stats.twoProportionZTest(df.repartition(1), "grp", "ok").collect().toSeq
    val b = Stats.twoProportionZTest(df.repartition(17), "grp", "ok").collect().toSeq
    assert(a == b)
  }

  test("auc: perfect separation reads 1, reversed reads 0, random-ish mid") {
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))
      .toDF("score", "lab")
    assert(Stats.aucExact(perfect, "score", "lab").collect().head
      .getAs[Double]("auc") == 1.0)
    val reversed = Seq((0.1, 1L), (0.2, 1L), (0.8, 0L), (0.9, 0L))
      .toDF("score", "lab")
    assert(Stats.aucExact(reversed, "score", "lab").collect().head
      .getAs[Double]("auc") == 0.0)
  }

  test("auc: tie-averaged ranks match the hand computation") {
    // scores: 1,2,2,3 with labels 0,0,1,1: ranks 1, 2.5, 2.5, 4
    // S = 2.5 + 4 = 6.5; U = 6.5 - 2*3/2 = 3.5; AUC = 3.5 / (2*2) = 0.875
    val df = Seq((1.0, 0L), (2.0, 0L), (2.0, 1L), (3.0, 1L))
      .toDF("score", "lab")
    val r = Stats.aucExact(df, "score", "lab").collect().head
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Double]("auc") == 0.875)
  }

  test("auc: all-equal scores read exactly 0.5; degenerate labels are empty") {
    val flat = Seq((5.0, 1L), (5.0, 0L), (5.0, 1L), (5.0, 0L))
      .toDF("score", "lab")
    assert(Stats.aucExact(flat, "score", "lab").collect().head
      .getAs[Double]("auc") == 0.5)
    val onlyPos = Seq((1.0, 1L), (2.0, 1L)).toDF("score", "lab")
    assert(Stats.aucExact(onlyPos, "score", "lab").collect().isEmpty)
  }

  test("auc: partitioning-invariant and equals the quadratic definition") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map(_ => (rnd.nextInt(50) / 10.0, rnd.nextInt(2).toLong))
    val df = rows.toDF("score", "lab")
    val a = Stats.aucExact(df.repartition(1), "score", "lab").collect().head
    val b = Stats.aucExact(df.repartition(17), "score", "lab").collect().head
    assert(a == b)
    // quadratic definition: P(pos > neg) + 0.5 P(pos == neg)
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val expect = BigDecimal(wins / (pos.length.toDouble * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a.getAs[Double]("auc") == expect)
  }

  test("ols2 recovers exact planted coefficients on a noiseless fixture") {
    // y = 2 + 3*x1 - 5*x2 exactly: OLS must recover (2, 3, -5) with r2 = 1
    val rows = for (i <- 1 to 40) yield {
      val x1 = i % 7 + 1.0; val x2 = (i * 3) % 5 + 0.5
      ("g", x1, x2, 2.0 + 3.0 * x1 - 5.0 * x2)
    }
    val got = Stats.ols2(rows.toDF("grp", "x1", "x2", "y"), "grp", "y", "x1", "x2")
      .collect().head
    assert(got.getAs[Double]("b0") == 2.0)
    assert(got.getAs[Double]("b1") == 3.0)
    assert(got.getAs[Double]("b2") == -5.0)
    assert(got.getAs[Double]("r2") == 1.0)
  }

  test("ols2 drops singular groups (collinear feature) and is partition-invariant") {
    val good = (1 to 30).map(i => ("ok", i % 6 + 1.0, (i * 7) % 4 + 1.0, i % 9 + 0.25))
    // x2 = 2*x1: Gram matrix singular -> group must be absent, not garbage
    val bad = (1 to 30).map(i => ("sing", i % 6 + 1.0, 2.0 * (i % 6 + 1), i % 5 + 0.5))
    val df = (good ++ bad).toDF("grp", "x1", "x2", "y")
    val a = Stats.ols2(df.repartition(1), "grp", "y", "x1", "x2")
      .orderBy("grp").collect().toSeq
    val b = Stats.ols2(df.repartition(13), "grp", "y", "x1", "x2")
      .orderBy("grp").collect().toSeq
    assert(a == b)
    assert(a.map(_.getString(0)) == Seq("ok"))
  }

  test("welch: hand-computed t and Satterthwaite df") {
    // a = [1,2,3,4]: mean 2.5, var 5/3; b = [2,4,6,8,10]: mean 6, var 10
    // sea = 5/12, seb = 2; t = -3.5/sqrt(29/12); df = (29/12)^2/((5/12)^2/3 + 1)
    val df = (Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(2, 4, 6, 8, 10).map(v => ("b", v.toDouble))).toDF("grp", "v")
    val Array(r) = Stats.welchTTest(df, "grp", "v").collect()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 4 && r.getLong(3) == 5)
    assert(r.getDouble(4) == 2.5 && r.getDouble(5) == 6.0)
    assert(r.getDouble(6) == -3.5)
    assert(math.abs(r.getDouble(7) - -2.251437) < 1e-5)
    assert(math.abs(r.getDouble(8) - 5.520785) < 1e-4)
    assert(r.getBoolean(9)) // |t| > 1.96
  }

  test("welch: identical arms read t = 0, not significant") {
    val df = (1 to 20).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("grp", "v")
    val Array(r) = Stats.welchTTest(df, "grp", "v").collect()
    assert(r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0 && !r.getBoolean(9))
  }

  test("welch: partitioning-invariant (decimal sufficient statistics)") {
    val df = (1 to 200).map(i =>
      (if (i % 3 == 0) "a" else "b", i * 0.37 + (i % 7))).toDF("grp", "v")
    val a = Stats.welchTTest(df.repartition(1), "grp", "v").collect().toSeq
    val b = Stats.welchTTest(df.repartition(13), "grp", "v").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("chi2: hand-computed 2x2 table") {
    // o = [[10,20],[30,40]]: terms 4/12, 4/18, 4/28, 4/42 (round-6 each)
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val Array(r) = Stats.chiSquareIndependence(rows.toDF("r", "c"), "r", "c").collect()
    assert(r.getDouble(0) == 0.79365)
    assert(r.getLong(1) == 1 && r.getLong(2) == 100)
    assert(math.abs(r.getDouble(3) - 0.089087) <= 1e-6)
  }

  test("chi2: proportional table reads zero (independence)") {
    // every row category splits 1:2 across columns -> expected == observed
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(20)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val Array(r) = Stats.chiSquareIndependence(rows.toDF("r", "c"), "r", "c").collect()
    assert(r.getDouble(0) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("corrMatrix: exact lines read +/-1, constants read 0, pairs named") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i, 100.0 - i, 7.0))
      .toDF("a", "b", "c", "d")
    val got = Stats.corrMatrix(df, Seq("a", "b", "c", "d")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set("a~b", "a~c", "a~d", "b~c", "b~d", "c~d"))
    assert(got("a~b") == 1.0 && got("a~c") == -1.0 && got("b~c") == -1.0)
    assert(got("a~d") == 0.0 && got("c~d") == 0.0) // zero-variance side
  }

  test("corrMatrix: nulls drop per pair; partitioning-invariant") {
    val df = (1 to 120).map(i => (i.toDouble,
      if (i % 5 == 0) None else Some(i * 0.5 + (i % 7)),
      (i % 11).toDouble)).toDF("a", "b", "c")
    val rows = Stats.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("a~b") == 96 && rows("a~c") == 120) // 24 nulls dropped in b
    def run(p: Int) = Stats.corrMatrix(df.repartition(p), Seq("a", "b", "c"))
      .orderBy("pair").collect().toSeq
    assert(run(1) == run(13))
  }

  test("gini: equal shares read 0, total concentration reads (n-1)/n") {
    val eq = (1 to 8).map(i => ("eq", 5.0)) ++
      (1 to 3).map(i => ("one", 0.0)) :+ (("one", 10.0))
    val got = Stats.giniPerGroup(eq.toDF("grp", "v"), "grp", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("eq") == 0.0)
    assert(got("one") == 0.75) // (n-1)/n with n = 4
  }

  test("gini: tie order cannot move the statistic; zero-total groups dropped") {
    val df = ((1 to 100).map(i => ("g", (i % 5).toDouble + 1)) ++
      Seq(("z", 0.0), ("z", 0.0))).toDF("grp", "v")
    def run(p: Int) = Stats.giniPerGroup(df.repartition(p), "grp", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(run(1) == run(7))
    assert(run(1).map(_._1) == Seq("g"))
  }

  test("winsorize: hand-computed bounds and means on 1..100") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val Array(r) = Stats.winsorizedMeans(df, "grp", "v", 5, 95).collect()
    assert(r.getLong(1) == 100)
    assert(r.getDouble(2) == 5.0 && r.getDouble(3) == 95.0)
    assert(r.getDouble(4) == 50.5)
    assert(r.getDouble(5) == 50.45) // 5050 - 10 + 20 - 490 + 475 = 5045
  }

  test("winsorize: clipping tames a planted whale; means else untouched") {
    val df = ((1 to 99).map(i => ("g", 10.0)) :+ (("g", 1e6))).toDF("grp", "v")
    val Array(r) = Stats.winsorizedMeans(df, "grp", "v", 5, 95).collect()
    assert(r.getDouble(3) == 10.0) // p95 of 99x10 + whale is still 10
    assert(r.getDouble(5) == 10.0 && r.getDouble(4) > 100.0)
  }

  test("quantileNormalize: one uniform group maps onto itself") {
    // values 5,15,25,35 / width 10: midpoint pcts interpolate back to v
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 15.0), ("g", 3L, 25.0),
      ("g", 4L, 35.0)).toDF("grp", "id", "v")
    val got = Stats.quantileNormalize(df, "grp", "v", "id", 10.0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == ((0.125, 5.0)) && got(2L) == ((0.375, 15.0)))
    assert(got(3L) == ((0.625, 25.0)) && got(4L) == ((0.875, 35.0)))
  }

  test("quantileNormalize: a shifted group lands on the global scale") {
    // group lo holds the bottom half, hi the top half of the global range:
    // each group's pcts span (0,1), so hi's low ranks map DOWN into lo's
    // value range -- distributions align
    val lo = (1 to 50).map(i => ("lo", i.toLong, i.toDouble))
    val hi = (1 to 50).map(i => ("hi", 100L + i, 1000.0 + i))
    val got = Stats.quantileNormalize((lo ++ hi).toDF("grp", "id", "v"),
      "grp", "v", "id", 50.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(101L) < 100.0)     // hi's smallest -> global bottom
    assert(got(50L) > 900.0)      // lo's largest -> global top
    // every normalized value stays inside the global histogram span
    assert(got.values.forall(v => v >= 0.0 && v <= 1100.0))
  }

  test("quantileNormalize: invariant under input partitioning") {
    val rows = (1 to 400).map(i => (s"g${i % 3}", i.toLong,
      (i % 37) * 3.0 + (i % 3) * 40.0))
    def run(p: Int) = Stats.quantileNormalize(
      rows.toDF("grp", "id", "v").repartition(p), "grp", "v", "id", 25.0)
      .orderBy("id").collect().toSeq
    assert(run(1) == run(11))
  }
}
