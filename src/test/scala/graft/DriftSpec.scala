package graft

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def obs(rows: (String, String)*) =
    rows.toDF("feature", "bucket")

  test("identical distributions score psi = 0") {
    val d = obs(("f", "A"), ("f", "A"), ("f", "B"), ("g", "X"))
    val got = Drift.psiReport(d, d)
      .select("feature", "psi").as[(String, Double)].collect().toMap
    assert(got == Map("f" -> 0.0, "g" -> 0.0))
  }

  test("a known swap scores its hand-computed psi") {
    // old: A×3 B×1; new: A×1 B×3; add-half smoothing over 2 buckets:
    // p_old(A)=3.5/5=.7, p_new(A)=1.5/5=.3 and mirrored for B.
    // term = round(-.4,6) * (round(ln .3,6) - round(ln .7,6))
    //      = -0.4 * -0.847298 = 0.3389192 each side -> psi 0.677838
    val o = obs(("f", "A"), ("f", "A"), ("f", "A"), ("f", "B"))
    val n = obs(("f", "A"), ("f", "B"), ("f", "B"), ("f", "B"))
    val row = Drift.psiReport(o, n).as[(String, Long, Long, Long, Double)]
      .collect().head
    assert(row == (("f", 2L, 4L, 4L, 0.677838)))
  }

  test("buckets present on one side only are smoothed in, not dropped") {
    val o = obs(("f", "A"), ("f", "A"))
    val n = obs(("f", "B"), ("f", "B"))
    val row = Drift.psiReport(o, n).as[(String, Long, Long, Long, Double)]
      .collect().head
    // total disjoint support: large but FINITE psi over the union buckets
    assert(row._2 == 2L && row._5 > 1.0 && !row._5.isInfinite)
  }

  test("psi is invariant to input partitioning (decimal term sums)") {
    val o = obs((1 to 500).map(i => ("f", s"b${i % 7}")): _*)
    val n = obs((1 to 500).map(i => ("f", s"b${i % 5}")): _*)
    val a = Drift.psiReport(o.repartition(1), n.repartition(1))
      .select("psi").as[Double].head()
    val b = Drift.psiReport(o.repartition(11), n.repartition(7))
      .select("psi").as[Double].head()
    assert(a == b)
  }

  private def wobs(rows: (String, String, Long)*) =
    rows.toDF("feature", "bucket", "label")

  test("woe: hand-computed two-bucket feature") {
    // bucket a: 3 pos, 1 neg; bucket b: 1 pos, 3 neg; totals 4/4, B=2
    // p_pos(a) = 3.5/5, p_neg(a) = 1.5/5 -> woe(a) = ln(.7) - ln(.3)
    val rows = wobs(
      (Seq.fill(3)(("f", "a", 1L)) ++ Seq(("f", "a", 0L)) ++
        Seq(("f", "b", 1L)) ++ Seq.fill(3)(("f", "b", 0L))): _*)
    val got = Drift.woeReport(rows).orderBy("bucket").collect()
    val wa = BigDecimal(math.round(math.log(0.7) * 1e6)) / 1e6 -
      BigDecimal(math.round(math.log(0.3) * 1e6)) / 1e6
    assert(got(0).getAs[Double]("woe") == wa.toDouble)
    // symmetric buckets: woe(b) = -woe(a); iv = 2 * 0.4 * woe(a)
    assert(got(1).getAs[Double]("woe") == -wa.toDouble)
    val iv = (BigDecimal("0.4") * wa + BigDecimal("-0.4") * (-wa))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getAs[Double]("iv") == iv)
    assert(got(0).getAs[Double]("iv") == got(1).getAs[Double]("iv"))
  }

  test("woe: uninformative feature reads woe 0 and iv 0") {
    val rows = wobs(
      ("f", "a", 1L), ("f", "a", 0L), ("f", "b", 1L), ("f", "b", 0L))
    val got = Drift.woeReport(rows).collect()
    assert(got.forall(_.getAs[Double]("woe") == 0.0))
    assert(got.forall(_.getAs[Double]("iv") == 0.0))
  }

  test("woe: one-sided buckets stay finite via add-half smoothing") {
    val rows = wobs(("f", "pure_pos", 1L), ("f", "pure_pos", 1L),
      ("f", "pure_neg", 0L), ("f", "pure_neg", 0L))
    val got = Drift.woeReport(rows).orderBy("bucket").collect()
    assert(got.length == 2)
    assert(got.forall(r => !r.getAs[Double]("woe").isInfinite))
    assert(got(0).getAs[Double]("woe") < 0) // pure_neg bucket
    assert(got(1).getAs[Double]("woe") > 0)
  }

  test("woe: multiple features independent; partitioning-invariant") {
    val rows = wobs((1 to 200).map { i =>
      (if (i % 2 == 0) "f1" else "f2", s"b${i % 5}", (i % 3 == 0).compareTo(false).toLong)
    }: _*)
    val a = Drift.woeReport(rows.repartition(1)).orderBy("feature", "bucket")
      .collect().toSeq
    val b = Drift.woeReport(rows.repartition(13)).orderBy("feature", "bucket")
      .collect().toSeq
    assert(a == b)
    assert(a.map(_.getString(0)).distinct == Seq("f1", "f2"))
  }
}
