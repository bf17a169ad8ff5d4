package graft

import graft.operators.Survival

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: (Long, Long)*) =
    Survival.kaplanMeier(rows.toDF("dur", "ev"), "dur", "ev")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("textbook curve: events and censoring interleaved") {
    // durations: 1(event), 2(censored), 3(event), 4(event), 5(censored)
    // t=1: n=5, d=1 -> S = 4/5 = .8
    // t=3: n=3, d=1 -> S = .8 * 2/3
    // t=4: n=2, d=1 -> S = .8 * 2/3 * 1/2
    val got = km((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L))
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 5L, 1L), (3L, 3L, 1L), (4L, 2L, 1L)))
    def rln(x: Double) = BigDecimal(math.round(math.log(x) * 1e6)) / 1e6
    def s(fs: Double*) = BigDecimal(math.exp(fs.map(rln).sum.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._4 == s(0.8))
    assert(got(1)._4 == s(0.8, 2.0 / 3))
    assert(got(2)._4 == s(0.8, 2.0 / 3, 0.5))
  }

  test("censored-only input yields an empty curve; survival never rises") {
    assert(km((1L, 0L), (5L, 0L)).isEmpty)
    val curve = km((1L, 1L), (1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L),
      (6L, 1L), (9L, 0L)).map(_._4)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a })
  }

  test("everyone dying at the last time pins the curve to exactly 0") {
    val got = km((2L, 1L), (5L, 1L), (5L, 1L))
    assert(got.last._4 == 0.0)
    assert(got.head._4 > 0.0)
  }

  test("ties at one time collapse into a single step with the summed deaths") {
    val got = km((3L, 1L), (3L, 1L), (3L, 0L), (7L, 0L))
    // t=3: n=4, d=2 -> S = 0.5
    assert(got.length == 1)
    assert(got.head == ((3L, 4L, 2L, 0.5)))
  }

  test("partitioning-invariant") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(2).toLong))
    val df = rows.toDF("dur", "ev")
    val a = Survival.kaplanMeier(df.repartition(1), "dur", "ev")
      .orderBy("t").collect().toSeq
    val b = Survival.kaplanMeier(df.repartition(13), "dur", "ev")
      .orderBy("t").collect().toSeq
    assert(a == b)
  }
}
