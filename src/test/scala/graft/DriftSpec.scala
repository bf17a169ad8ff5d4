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
}
