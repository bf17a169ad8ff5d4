package graft

import graft.operators.Classify
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val trainRows = Seq(
    (0L, "sport", "goal match team goal win"),
    (1L, "sport", "team match score win fast"),
    (2L, "sport", "goal win team"),
    (3L, "tech", "code spark query join code"),
    (4L, "tech", "query join table code"),
    (5L, "cook", "salt pan stir salt oven"))
  private val testRows = Seq(
    (10L, "sport", "match team win"),
    (11L, "tech", "spark join query code"),
    (12L, "cook", "salt oven stir"),
    (13L, "sport", "lorem ipsum"))
  private val train = trainRows.toDF("doc_id", "label", "text")
  private val held = testRows.toDF("doc_id", "label", "text")

  // independent Scala mirror of the operator's arithmetic (PolyHash slots,
  // add-one smoothing, per-ln round-6, decimal sums, argmax ties by label)
  private val Mod = 2147483647L
  private def slot(tok: String, n: Int): Long =
    tok.foldLeft(0L)((acc, ch) => (acc * 131 + ch.toLong) % Mod) % n
  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def mirror(numSlots: Int): Map[Long, (String, Double)] = {
    val byLabel = trainRows.groupBy(_._2)
    val slotCt = byLabel.map { case (l, rs) =>
      l -> rs.flatMap(_._3.split(" ")).groupBy(slot(_, numSlots))
        .map { case (s, g) => s -> g.size.toLong }
    }
    val totals = byLabel.map { case (l, rs) => l -> rs.flatMap(_._3.split(" ")).size }
    val priors = byLabel.map { case (l, rs) =>
      l -> r6(math.log(rs.size.toDouble / trainRows.size)) }
    testRows.map { case (id, _, text) =>
      val scores = byLabel.keys.toSeq.sorted.map { l =>
        val s = text.split(" ").map { tok =>
          r6(math.log((slotCt(l).getOrElse(slot(tok, numSlots), 0L) + 1.0) /
            (totals(l).toDouble + numSlots)))
        }.sum + priors(l)
        l -> s.toDouble
      }
      // argmax with ties by label ascending: sort by (-score, label), head
      val (pred, logp) = scores.sortBy { case (l, s) => (-s, l) }.head
      id -> (pred, logp)
    }.toMap
  }

  test("predictions match the hand mirror exactly") {
    val got = Classify.naiveBayesEval(train, held, numSlots = 64)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    assert(got === mirror(64))
  }

  test("planted class structure is recovered on in-domain docs") {
    val got = Classify.naiveBayesEval(train, held, numSlots = 64)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(3))).toList
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId(10L) === "sport")
    assert(byId(11L) === "tech")
    assert(byId(12L) === "cook")
    // off-domain doc 13 gets SOME deterministic label; correctness flag wired
    assert(got.find(_._1 === 10L).get._3)
  }

  test("model is dense and bounded: labels x numSlots rows") {
    val model = Classify.trainNaiveBayes(train, numSlots = 32)
    assert(model.count() === 3L * 32L)
    // absent (label, slot) pairs carry the smoothing floor, not nulls
    assert(model.filter(col("lp").isNull || col("prior").isNull).count() === 0L)
  }

  test("scores are partitioning-invariant") {
    val a = Classify.naiveBayesEval(train, held, numSlots = 64)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4))).sortBy(_._1).toSeq
    val b = Classify.naiveBayesEval(train.repartition(7), held.repartition(5), numSlots = 64)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("logreg: separable tokens get sign-correct weights; bias tracks base rate") {
    val docs = ((1L to 20L).map(i => (i, "good stuff here", 1L)) ++
      (21L to 40L).map(i => (i, "bad junk there", 0L)))
      .toDF("doc_id", "text", "y")
    val w = Classify.logisticTrain(docs, "y", dim = 64, iters = 3, lr = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 65 && w.contains(-1L))
    // slots of positive-only tokens must be positive, negative-only negative
    import graft.functions.PortableHashes
    def slotOf(tok: String): Long = {
      val df = Seq(tok).toDF("t")
        .select((PortableHashes.tokenSlot(col("t")) % 64).cast("long"))
      df.collect().head.getLong(0)
    }
    // only slots NOT shared between classes carry a clean sign (a hashed
    // collision sees both labels and its gradient cancels)
    val posSlots = Seq("good", "stuff", "here").map(slotOf).toSet
    val negSlots = Seq("bad", "junk", "there").map(slotOf).toSet
    (posSlots -- negSlots).foreach(s =>
      assert(w(s) > 0, s"slot $s should pull positive"))
    (negSlots -- posSlots).foreach(s =>
      assert(w(s) < 0, s"slot $s should pull negative"))
    assert((posSlots -- negSlots).nonEmpty && (negSlots -- posSlots).nonEmpty)
    // balanced labels: bias stays near zero
    assert(math.abs(w(-1L)) < 0.05)
  }

  test("logreg: all-positive corpus pushes the bias up monotonically") {
    val docs = (1L to 10L).map(i => (i, s"tok$i filler", 1L))
      .toDF("doc_id", "text", "y")
    def bias(iters: Int) = Classify.logisticTrain(docs, "y", 16, iters, 0.5)
      .filter(col("slot") === -1).collect().head.getDouble(1)
    assert(bias(1) > 0 && bias(2) > bias(1) && bias(3) > bias(2))
  }

  test("logreg: trajectory is partitioning-invariant (decimal sums)") {
    val rnd = new scala.util.Random(23)
    val docs = (1L to 120L).map { i =>
      (i, (1 to 8).map(_ => s"w${rnd.nextInt(40)}").mkString(" "), (i % 3 == 0).compareTo(false).toLong)
    }.toDF("doc_id", "text", "y")
    val a = Classify.logisticTrain(docs.repartition(1), "y", 32, 3, 0.5)
      .orderBy("slot").collect().toSeq
    val b = Classify.logisticTrain(docs.repartition(17), "y", 32, 3, 0.5)
      .orderBy("slot").collect().toSeq
    assert(a == b)
  }

  test("calibration: hand-computed buckets and Brier") {
    // bucket 0: scores .05/.05 labels 0,0 -> mean .05, rate 0
    // bucket 9: scores .95/1.0 labels 1,1 -> mean .975, rate 1 (1.0 capped)
    val df = Seq((0.05, 0L), (0.05, 0L), (0.95, 1L), (1.0, 1L))
      .toDF("score", "lab")
    val got = Classify.calibrationReport(df, "score", "lab")
      .orderBy("bucket").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 9L))
    assert(got(0).getAs[Double]("mean_pred") == 0.05)
    assert(got(0).getAs[Double]("obs_rate") == 0.0)
    assert(got(1).getAs[Double]("mean_pred") == 0.975)
    assert(got(1).getAs[Double]("obs_rate") == 1.0)
    // brier = (.05^2 + .05^2 + .05^2 + 0) / 4 = 0.001875
    assert(got.forall(_.getAs[Double]("brier") == 0.001875))
  }

  test("calibration: perfectly calibrated buckets show mean_pred == obs_rate") {
    // 10 rows at 0.3 with 3 positives; 10 rows at 0.7 with 7 positives
    val rows = (1 to 10).map(i => (0.3, if (i <= 3) 1L else 0L)) ++
      (1 to 10).map(i => (0.7, if (i <= 7) 1L else 0L))
    val got = Classify.calibrationReport(rows.toDF("score", "lab"),
      "score", "lab").orderBy("bucket").collect()
    got.foreach { r =>
      assert(r.getAs[Double]("mean_pred") == r.getAs[Double]("obs_rate"))
    }
  }

  test("calibration: partitioning-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map(_ => (rnd.nextInt(1000) / 999.0,
      rnd.nextInt(2).toLong))
    val df = rows.toDF("score", "lab")
    val a = Classify.calibrationReport(df.repartition(1), "score", "lab")
      .orderBy("bucket").collect().toSeq
    val b = Classify.calibrationReport(df.repartition(19), "score", "lab")
      .orderBy("bucket").collect().toSeq
    assert(a == b)
  }

  test("stump: perfectly separable feature finds the zero-Gini threshold") {
    // y=0 at x in [0,10), y=1 at x in [10,20): split at 10.0 is pure
    val df = (0 until 20).map(i => (if (i < 10) 0L else 1L, i.toDouble,
      (i % 4).toDouble)).toDF("y", "x", "noise")
    val rows = Classify.decisionStump(df, "y",
      Seq(("x", 1.0), ("noise", 1.0))).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = rows("x")
    assert(x.getDouble(1) == 10.0 && x.getDouble(2) == 0.0)
    assert(x.getLong(3) == 10 && x.getLong(4) == 0) // left: all negatives
    assert(x.getLong(5) == 10 && x.getLong(6) == 10) // right: all positives
    // the noise feature (y independent of value) cannot reach purity
    assert(rows("noise").getDouble(2) > 0.3)
  }

  test("stump: hand-computed Gini on a 2-bucket overlap") {
    // bucket 0: 3 neg 1 pos; bucket 1: 1 neg 3 pos; only split: threshold 1
    // left (4): p=1/4, g=0.375; right (4): p=3/4, g=0.375; gini=0.375
    val df = (Seq.fill(3)((0L, 0.5)) ++ Seq((1L, 0.5)) ++
      Seq((0L, 1.5)) ++ Seq.fill(3)((1L, 1.5))).toDF("y", "x")
    val Array(r) = Classify.decisionStump(df, "y", Seq(("x", 1.0))).collect()
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 0.375)
  }

  test("stump: single occupied bucket yields no row; invariance") {
    val one = Seq((0L, 2.2), (1L, 2.3)).toDF("y", "x") // same bucket at bw=1
    assert(Classify.decisionStump(one, "y", Seq(("x", 1.0))).collect().isEmpty)
    val df = (1 to 300).map(i => ((i % 3 == 0).compare(false).toLong,
      (i % 23).toDouble + i % 7, (i % 11).toDouble)).toDF("y", "a", "b")
    def run(p: Int) = Classify.decisionStump(df.repartition(p), "y",
      Seq(("a", 2.0), ("b", 3.0))).orderBy("feature").collect().toSeq
    assert(run(1) == run(17))
  }

  test("labelNoise: the planted mislabeled doc is the review queue") {
    // class a speaks "xx", class b speaks "yy"; doc 99 is labeled a but
    // speaks pure b — the one confident disagreement
    val docs = ((1L to 20L).map(i => (i, "a", "xx xx xx zz")) ++
      (21L to 40L).map(i => (i, "b", "yy yy yy zz")) :+
      ((99L, "a", "yy yy yy yy"))).toDF("doc_id", "label", "text")
    val rows = Classify.labelNoiseReport(docs).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(99L))
    val r = rows.head
    assert(r.getString(1) == "a" && r.getString(2) == "b")
    assert(r.getDouble(5) > 0.0) // margin strictly positive by construction
    assert(r.getDouble(3) > r.getDouble(4)) // logp_pred > logp_actual
  }

  test("labelNoise: a clean corpus yields an empty queue") {
    val docs = ((1L to 15L).map(i => (i, "a", "xx xx")) ++
      (16L to 30L).map(i => (i, "b", "yy yy"))).toDF("doc_id", "label", "text")
    assert(Classify.labelNoiseReport(docs).collect().isEmpty)
  }

  test("conformal: degenerate residuals give qhat 0 and full coverage") {
    val df = (1L to 200L).map(id => ("g", id, 5.0)).toDF("grp", "id", "v")
    val Array(r) = Classify.conformalReport(df, "grp", "id", "v").collect()
    assert(r.getLong(1) + r.getLong(2) == 200) // cal + test partition
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 0.0 && r.getDouble(5) == 1.0)
  }

  test("conformal: coverage meets the 1-alpha guarantee on exchangeable data") {
    // deterministic pseudo-random values, exchangeable across the hash split
    val df = (1L to 2000L).map(id =>
      ("g", id, ((id * 2654435761L) % 1000L).toDouble)).toDF("grp", "id", "v")
    val Array(r) = Classify.conformalReport(df, "grp", "id", "v",
      calFrac = 0.5, alphaPct = 10).collect()
    assert(r.getDouble(5) >= 0.87, s"coverage ${r.getDouble(5)}")
    assert(r.getDouble(4) > 0.0) // nontrivial interval
  }

  test("conformal: qhat is the exact conformal rank of calibration residuals") {
    val df = (1L to 500L).map(id => ("g", id, (id % 97).toDouble)).toDF("grp", "id", "v")
    val Array(r) = Classify.conformalReport(df, "grp", "id", "v").collect()
    val (nCal, qhat) = (r.getLong(1), r.getDouble(4))
    val mean = r.getDouble(3)
    // recompute the calibration residual list with the same split + rounding
    val M = 2147483648.0
    def unit(id: Long): Double = {
      val lo = id & 2147483647L; val hi = (id >> 31) & 2147483647L
      (((lo ^ ((hi * 1103515245 + 12345) % 2147483648L)) * 1103515245 + 12345)
        % 2147483648L) / M
    }
    val res = (1L to 500L).filter(unit(_) < 0.5)
      .map(id => BigDecimal(math.abs((id % 97).toDouble - mean))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).sorted
    assert(res.size == nCal)
    val target = math.min(nCal, ((nCal + 1) * 90 + 99) / 100).toInt
    assert(qhat == res(target - 1))
  }
}
