package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { p =>
      !pts.exists(q => q._2 <= p._2 && q._3 <= p._3 &&
        (q._2 < p._2 || q._3 < p._3))
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Double)]): Set[Long] =
    Skyline.skyline2D(pts.toDF("id", "x", "y"), "id", "x", "y")
      .select("id").as[Long].collect().toSet

  test("staircase: only the lower-left frontier survives") {
    val pts = Seq((1L, 1.0, 9.0), (2L, 3.0, 7.0), (3L, 5.0, 5.0),
      (4L, 7.0, 3.0), (5L, 9.0, 1.0), // frontier
      (6L, 4.0, 8.0), (7L, 6.0, 6.0), (8L, 9.0, 9.0)) // dominated
    assert(run(pts) == Set(1L, 2L, 3L, 4L, 5L))
    assert(run(pts) == brute(pts))
  }

  test("equal-x and equal-point ties follow the dominance definition") {
    // same x, smaller y dominates; identical (x, y) duplicates both stay
    val pts = Seq((1L, 2.0, 5.0), (2L, 2.0, 3.0), (3L, 2.0, 3.0),
      (4L, 1.0, 9.0))
    val got = run(pts)
    assert(got == brute(pts))
    assert(got == Set(2L, 3L, 4L))
  }

  test("single point and fully-dominated columns") {
    assert(run(Seq((9L, 4.0, 4.0))) == Set(9L))
    // a point equal in y but worse in x is dominated
    val pts = Seq((1L, 1.0, 1.0), (2L, 2.0, 1.0), (3L, 1.0, 2.0))
    assert(run(pts) == Set(1L))
  }

  test("randomized: matches brute force, partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(i =>
      (i, (rnd.nextInt(40) + 1).toDouble, (rnd.nextInt(40) + 1).toDouble))
    assert(run(pts) == brute(pts))
    val df = pts.toDF("id", "x", "y")
    val a = Skyline.skyline2D(df.repartition(1), "id", "x", "y")
      .select("id").as[Long].collect().toSet
    val b = Skyline.skyline2D(df.repartition(13), "id", "x", "y")
      .select("id").as[Long].collect().toSet
    assert(a == b && a == brute(pts))
  }
}
