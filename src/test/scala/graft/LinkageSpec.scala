package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("fieldWeights: hand-computed log2 evidence weights") {
    val (wa, wd) = Linkage.fieldWeights(0.9, 0.05)
    assert(wa.doubleValue() == 4.169925)  // log2(18)
    assert(wd.doubleValue() == -3.247928) // log2(0.1/0.95)
    intercept[IllegalArgumentException](Linkage.fieldWeights(0.05, 0.9))
    intercept[IllegalArgumentException](Linkage.fieldWeights(1.0, 0.5))
  }

  test("fsScore: weights add, thresholds classify, null agrees as disagree") {
    val pairs = Seq(
      (1L, 2L, Some(true), Some(true)),   // both agree
      (1L, 3L, Some(true), Some(false)),  // mixed
      (2L, 3L, Some(false), Some(false)), // both disagree
      (3L, 4L, None, Some(true))          // null = conservative disagree
    ).toDF("a", "b", "f1", "f2")
    val fields = Seq(("f1", 0.9, 0.05), ("f2", 0.8, 0.1))
    val (w1a, w1d) = Linkage.fieldWeights(0.9, 0.05)
    val (w2a, w2d) = Linkage.fieldWeights(0.8, 0.1)
    val got = Linkage.fsScore(pairs, fields, upper = 5.0, lower = -2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDecimal(4).doubleValue(), r.getString(5)))).toMap
    def s(x: java.math.BigDecimal, y: java.math.BigDecimal) =
      x.add(y).doubleValue()
    assert(got((1L, 2L)) == ((s(w1a, w2a), "match")))      // 7.16... >= 5
    assert(got((1L, 3L)) == ((s(w1a, w2d), "possible")))   // 2.0  in between
    assert(got((2L, 3L)) == ((s(w1d, w2d), "non_match"))) // -6.4... <= -2
    assert(got((3L, 4L)) == ((s(w1d, w2a), "possible")))
  }
}
