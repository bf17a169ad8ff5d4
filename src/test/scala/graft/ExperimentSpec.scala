package graft

import graft.operators.Experiment
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("srm: exact design split reads chi2 0; a skewed split is flagged") {
    val even = (0 until 30).map(i => Tuple1((i % 3).toString)).toDF("arm")
    val Array(ok) = Experiment.srmCheck(even, "arm",
      Seq("0" -> (1.0 / 3), "1" -> (1.0 / 3), "2" -> (1.0 / 3))).collect()
    assert(ok.getDouble(0) == 0.0 && ok.getLong(1) == 2 && !ok.getBoolean(4))
    // 40/10/10 vs uniform 60/3: terms 20 + 5 + 5 = 30
    val skew = (Seq.fill(40)("0") ++ Seq.fill(10)("1") ++ Seq.fill(10)("2"))
      .map(Tuple1(_)).toDF("arm")
    val Array(bad) = Experiment.srmCheck(skew, "arm",
      Seq("0" -> (1.0 / 3), "1" -> (1.0 / 3), "2" -> (1.0 / 3))).collect()
    assert(bad.getDouble(0) == 30.0 && bad.getBoolean(4))
  }

  test("srm: an arm with zero observations counts as o = 0, not a dropped row") {
    val df = (Seq.fill(10)("0") ++ Seq.fill(10)("1")).map(Tuple1(_)).toDF("arm")
    val Array(r) = Experiment.srmCheck(df, "arm",
      Seq("0" -> 0.5, "1" -> 0.25, "2" -> 0.25)).collect()
    assert(r.getLong(1) == 2) // dof = 3 arms - 1
    assert(r.getLong(3) == 0) // all observed arms are designed
    assert(r.getBoolean(4)) // 0/5 expected-5 arm alone contributes 5
  }

  test("srm: the critical value tracks dof, and a stray arm always flags") {
    import org.apache.spark.sql.functions.col
    // 3 arms, dof 2 -> critical 5.991; chi2 4.266 would flag under the old
    // dof=1 value 3.841 but must NOT flag here: 38/22/30 vs uniform 90/3
    val mild = (Seq.fill(38)("0") ++ Seq.fill(22)("1") ++ Seq.fill(30)("2"))
      .map(Tuple1(_)).toDF("arm")
    val third = 1.0 / 3
    val Array(m) = Experiment.srmCheck(mild, "arm",
      Seq("0" -> third, "1" -> third, "2" -> third)).collect()
    assert(m.getDouble(0) > 3.841459 && m.getDouble(0) < 5.991465)
    assert(!m.getBoolean(4))
    // an observed arm outside the design flips suspect and is counted,
    // while n covers only the designed arms
    val stray = (Seq.fill(15)("0") ++ Seq.fill(15)("1") ++ Seq.fill(5)("zz"))
      .map(Tuple1(_)).toDF("arm")
    val Array(s) = Experiment.srmCheck(stray, "arm",
      Seq("0" -> 0.5, "1" -> 0.5)).collect()
    assert(s.getDouble(0) == 0.0 && s.getLong(2) == 30 && s.getLong(3) == 1)
    assert(s.getBoolean(4))
    // explicit critical still wins
    val Array(e) = Experiment.srmCheck(mild, "arm",
      Seq("0" -> third, "1" -> third, "2" -> third),
      critical = Some(3.841459)).collect()
    assert(e.getBoolean(4))
    assert(mild.select(col("arm")).distinct().count() == 3)
  }

  test("cuped: a perfectly predictive covariate removes all variance") {
    // per unit: pre value x, post value 2x -> theta 2, var_yadj 0
    val cut = 1000L
    val ev = (1 to 10).flatMap(i => Seq(
      (i.toLong, 500L, i.toDouble), (i.toLong, 1500L, 2.0 * i)))
      .toDF("unit", "ts", "v")
    val Array(r) = Experiment.cuped(ev, "unit", "ts", "v", cut).collect()
    assert(r.getLong(0) == 10)
    assert(r.getDouble(1) == 2.0) // theta
    assert(r.getDouble(3) == 0.0) // var_yadj
    assert(r.getDouble(4) == 100.0) // var_reduction_pct
  }

  test("cuped: zero-imputation for units without pre-period activity") {
    // all x = 0 -> var_x 0, dxx 0 -> the degenerate filter drops the row
    val ev = (1 to 5).map(i => (i.toLong, 1500L, i.toDouble)).toDF("unit", "ts", "v")
    assert(Experiment.cuped(ev, "unit", "ts", "v", 1000L).collect().isEmpty)
  }

  test("cuped: partitioning-invariant") {
    val ev = (1 to 300).map(i =>
      (i % 40L, (i % 7) * 400L, (i % 11) + i * 0.01)).toDF("unit", "ts", "v")
    def run(p: Int) = Experiment.cuped(ev.repartition(p), "unit", "ts", "v", 1000L)
      .collect().toSeq
    assert(run(1) == run(13) && run(1).nonEmpty)
  }

  test("did: hand-computed 2x2 interaction") {
    // control pre [1,2] post [2,3]; treat pre [1,3] post [5,7]
    // effect = (6 - 2) - (2.5 - 1.5) = 3
    val rows = Seq((false, 1L, 1.0), (false, 2L, 2.0), (false, 11L, 2.0),
      (false, 12L, 3.0), (true, 3L, 1.0), (true, 4L, 3.0),
      (true, 13L, 5.0), (true, 14L, 7.0)).toDF("treat", "ts", "v")
    val Array(r) = Experiment.diffInDiff(rows, "treat", "ts", "v", 10L).collect()
    assert(r.getDouble(0) == 1.5 && r.getDouble(1) == 2.5)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == 3.0)
  }

  test("attribution: linear splits credit, last-touch picks the latest") {
    // u1: click@10, view@20, purchase@30 (both in window, k=2)
    // u2: purchase@50 with no touches; u3: click@5, purchase@200 (stale)
    val ev = Seq((1L, "click", 10L, 1L), (1L, "view", 20L, 2L),
      (1L, "purchase", 30L, 3L), (2L, "purchase", 50L, 4L),
      (3L, "click", 5L, 5L), (3L, "purchase", 200L, 6L))
      .toDF("u", "t", "ts", "id")
    val got = Experiment.attribution(ev, "u", "t", "ts", "id", "purchase",
      Seq("click", "view"), lookback = 100L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got("click") == ((0L, 0.5, 1L)))
    assert(got("view") == ((1L, 0.5, 1L)))
    assert(got("(none)") == ((2L, 2.0, 2L)))
  }

  test("attribution: every conversion is accounted for exactly once (last model)") {
    val ev = (1 to 400).map { i =>
      val t = if (i % 4 == 0) "purchase" else Seq("click", "view")(i % 2)
      (i % 23L, t, i * 1000L, i.toLong)
    }.toDF("u", "t", "ts", "id")
    val rep = Experiment.attribution(ev, "u", "t", "ts", "id", "purchase",
      Seq("click", "view"), lookback = 50000L).collect()
    val nConv = ev.filter(col("t") === "purchase").count()
    assert(rep.map(_.getLong(1)).sum == nConv) // last-touch credits sum to #conv
  }

  test("bradleyTerry: dominance ordering, clamp, and share normalization") {
    // A beats B 3x, B beats C 3x, A beats C 2x, C beats A 1x; D loses all
    val m = (Seq.fill(3)(("A", "B")) ++ Seq.fill(3)(("B", "C")) ++
      Seq.fill(2)(("A", "C")) ++ Seq(("C", "A")) ++
      Seq(("A", "D"), ("B", "D"), ("C", "D"))).toDF("winner", "loser")
    val got = Experiment.bradleyTerry(m).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("A")._1 == 6L && got("A")._2 == 7L)
    assert(got("D") == ((0L, 3L, 0.000001, 0.0))) // all-losses clamp
    assert(got("A")._3 > got("B")._3 && got("B")._3 > got("C")._3)
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-4) // shares ~ 1
  }

  test("bradleyTerry: invariant under input partitioning") {
    val m = (1 to 300).map(i => (s"i${i % 7}", s"i${(i * 3 + 1) % 7}"))
      .filter(p => p._1 != p._2).toDF("winner", "loser")
    def run(p: Int) = Experiment.bradleyTerry(m.repartition(p))
      .orderBy("item").collect().toSeq
    assert(run(1) == run(13))
  }

  test("bt warm fold: merged counts equal the cold aggregate exactly") {
    // btInsert's additive matchup merge must be indistinguishable from
    // aggregating all matches at once — counts are the sufficient
    // statistic, so this is THE warm-fold soundness invariant
    val all = (1 to 240).map(i => (s"i${i % 6}", s"i${(i * 5 + 2) % 6}", i % 10 == 0))
      .filter(p => p._1 != p._2)
    val base = all.filter(!_._3).map(t => (t._1, t._2)).toDF("winner", "loser")
    val late = all.filter(_._3).map(t => (t._1, t._2)).toDF("winner", "loser")
    val folded = Experiment.btInsert(Experiment.btInit(base), late, iters = 0)
      .pairCounts.orderBy("i", "j").collect().toSeq
    val cold = Experiment
      .btInit(all.map(t => (t._1, t._2)).toDF("winner", "loser"))
      .pairCounts.orderBy("i", "j").collect().toSeq
    assert(folded == cold)
  }

  test("bt warm fold: warm insert reaches the cold fixpoint (shares)") {
    // run both trajectories PAST convergence: cold 14 rounds on the full
    // match set vs warm init(5) -> insert(2) -> 12 more warm rounds. BT
    // strengths are identified only up to SCALE (the MM map is
    // scale-equivariant; fixpoints form a ray), so a warm start converges
    // to the same ray at a different scale — strength_share is the
    // identified, comparable quantity, and wins/games are exact
    val all = (1 to 400).map(i => (s"i${i % 5}", s"i${(i * 7 + 3) % 5}", i % 10 == 0))
      .filter(p => p._1 != p._2)
    val base = all.filter(!_._3).map(t => (t._1, t._2)).toDF("winner", "loser")
    val late = all.filter(_._3).map(t => (t._1, t._2)).toDF("winner", "loser")
    val warm = Experiment.btRounds(
      Experiment.btInsert(Experiment.btRounds(Experiment.btInit(base), 5),
        late, iters = 2), 12)
    val cold = Experiment.btRounds(
      Experiment.btInit(all.map(t => (t._1, t._2)).toDF("winner", "loser")), 14)
    def shares(st: Experiment.BtState) = Experiment.btScores(st)
      .orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .toSeq
    val (w, c) = (shares(warm), shares(cold))
    assert(w.map(t => (t._1, t._2, t._3)) == c.map(t => (t._1, t._2, t._3)),
      "wins/games are exact sufficient statistics and must match verbatim")
    val gap = w.zip(c).map { case (a, b) => math.abs(a._4 - b._4) }.max
    // the round-6 iterate freezes each trajectory a few 1e-6 quanta off
    // the common ray (the rankInsert spec's quantization-noise argument)
    assert(gap <= 2e-5, s"warm and cold shares must agree within round-6 " +
      s"quantization noise, gap=$gap")
    // and a new item arriving ONLY in the batch enters at the init rule
    // and converges too
    val late2 = (late.collect().map(r => (r.getString(0), r.getString(1)))
      :+ (("i0", "zNew")) :+ (("zNew", "i1"))).toSeq.toDF("winner", "loser")
    val warm2 = Experiment.btScores(Experiment.btInsert(
      Experiment.btRounds(Experiment.btInit(base), 5), late2, iters = 8))
    val znew = warm2.filter($"item" === "zNew").collect()
    assert(znew.length == 1 && znew(0).getLong(2) == 2L) // 2 games
  }

  test("PrefIngest daemon: at-rest BT state folds per drop, idempotent retry") {
    import java.nio.file.{Files, Path => JPath}
    val in = Files.createTempDirectory("pref-in").toString
    val ckpt = Files.createTempDirectory("pref-ckpt").toString
    val st = Files.createTempDirectory("pref-st").toString + "/bt"
    val all = (1 to 300).map(i => (s"i${i % 5}", s"i${(i * 7 + 3) % 5}", i % 10 == 0))
      .filter(p => p._1 != p._2)
    def jsonl(rows: Seq[(String, String)], off: Int): String =
      rows.zipWithIndex.map { case ((w, l), ix) =>
        s"""{"match_id": ${off + ix}, "winner": "$w", "loser": "$l"}"""
      }.mkString("\n")
    val base = all.filter(!_._3).map(t => (t._1, t._2))
    val late = all.filter(_._3).map(t => (t._1, t._2))
    Files.writeString(JPath.of(in, "w1.jsonl"), jsonl(base, 0))
    graft.streaming.PrefIngest.start(spark, in, ckpt, st, iters = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination()
    def served() = Experiment.btServedScores(spark, st).orderBy("item")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // drop 1 rides the cold path: bit-identical to btInit + coldIters
    val cold1 = Experiment.btScores(Experiment.btRounds(
      Experiment.btInit(base.toDF("winner", "loser")), 5)).orderBy("item")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(served() == cold1, "drop 1 must equal the cold init trajectory")
    Files.writeString(JPath.of(in, "w2.jsonl"), jsonl(late, 100000))
    graft.streaming.PrefIngest.start(spark, in, ckpt, st, iters = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination()
    // drop 2 rides the warm path: bit-identical to the programmatic
    // btInsert trajectory (the q206 contract, now through the daemon)
    val warm2 = Experiment.btScores(Experiment.btInsert(
      Experiment.btRounds(Experiment.btInit(base.toDF("winner", "loser")), 5),
      late.toDF("winner", "loser"), iters = 2)).orderBy("item")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val after2 = served()
    assert(after2 == warm2, "drop 2 must equal the programmatic warm fold")
    // retry of the committed batch 1: counts must NOT double-add
    Experiment.btCommitBatch(spark, st, late.toDF("winner", "loser"), 1L,
      iters = 2)
    assert(served() == after2, "a retried committed batch must no-op")
  }
}
