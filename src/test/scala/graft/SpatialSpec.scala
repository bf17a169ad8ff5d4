package graft

import graft.operators.Spatial
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: all pairs by the same rounded haversine. */
  private def brute(pts: Seq[(Long, Double, Double)], radiusKm: Double)
      : Set[(Long, Long)] = {
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val p1 = math.toRadians(a._2); val p2 = math.toRadians(b._2)
      val dp = math.toRadians(b._2 - a._2); val dl = math.toRadians(b._3 - a._3)
      val x = math.sin(dp / 2) * math.sin(dp / 2) +
        math.cos(p1) * math.cos(p2) * (math.sin(dl / 2) * math.sin(dl / 2))
      2.0 * Spatial.EarthRadiusKm * math.asin(math.sqrt(x))
    }
    (for {
      a <- pts; b <- pts if a._1 < b._1
      d = BigDecimal(hav(a, b)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if d <= radiusKm
    } yield (a._1, b._1)).toSet
  }

  private def run(pts: Seq[(Long, Double, Double)], radiusKm: Double)
      : Set[(Long, Long)] =
    Spatial.withinDistancePairs(pts.toDF("id", "lat", "lon"), radiusKm)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

  test("mid-latitude clusters: bucketed join finds exactly the brute-force pairs") {
    val pts = Seq(
      (1L, 48.0, 11.0), (2L, 48.1, 11.2), (3L, 48.05, 11.1), // Munich-ish cluster
      (4L, 52.5, 13.4), (5L, 52.52, 13.41),                  // Berlin pair
      (6L, 40.7, -74.0),                                      // alone
      (7L, -33.9, 151.2), (8L, -33.85, 151.1))                // Sydney pair
    for (r <- Seq(5.0, 30.0, 600.0))
      assert(run(pts, r) == brute(pts, r), s"radius $r")
  }

  test("antimeridian seam: pairs straddling ±180 are found") {
    val pts = Seq((1L, 10.0, 179.95), (2L, 10.0, -179.95), (3L, 10.0, 179.0),
      (4L, -10.0, -179.99))
    val got = run(pts, 25.0)
    assert(got == brute(pts, 25.0))
    assert(got.contains((1L, 2L))) // 0.1 deg of lon apart across the seam
  }

  test("polar cap: near-pole pairs cross the per-cell/cap boundary unseen by neither") {
    val pts = Seq(
      (1L, 89.9, 0.0), (2L, 89.9, 180.0),     // ~22 km apart over the pole
      (3L, 86.0, 10.0), (4L, 86.0, 14.0),     // deep polar, same parallel
      (5L, 84.9, 20.0), (6L, 85.1, 20.0),     // straddling CapLat
      (7L, 84.0, 50.0), (8L, 84.2, 50.0),     // below the cap, near it
      (9L, -89.95, 33.0), (10L, -89.95, -147.0)) // south polar antipodal lons
    for (r <- Seq(25.0, 60.0, 400.0))
      assert(run(pts, r) == brute(pts, r), s"radius $r")
  }

  test("randomized globe: no pair lost at any latitude band") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 120L).map { i =>
      // mix uniform with polar-heavy samples to stress the cap machinery
      val lat = if (i % 4 == 0) 83.0 + rnd.nextDouble() * 6.9
                else rnd.nextDouble() * 176.0 - 88.0
      (i, lat, rnd.nextDouble() * 360.0 - 180.0)
    }
    for (r <- Seq(50.0, 300.0, 900.0))
      assert(run(pts, r) == brute(pts, r), s"radius $r")
  }

  test("dist_km is round-6 and pairs are ordered a_id < b_id") {
    val pts = Seq((9L, 0.0, 0.0), (3L, 0.0, 0.3))
    val rows = Spatial.withinDistancePairs(pts.toDF("id", "lat", "lon"), 50.0)
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 1)
    val (a, b, d) = rows.head
    assert(a == 3L && b == 9L)
    assert(d == BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // 0.3 deg of equatorial lon on the R=6371 sphere: 0.3 * pi*6371/180
    assert(math.abs(d - 33.3585) < 0.01)
  }

  test("duplicate coordinates pair at distance zero; identical ids never self-pair") {
    val pts = Seq((1L, 10.0, 10.0), (2L, 10.0, 10.0), (3L, 10.0, 10.0))
    val got = Spatial.withinDistancePairs(pts.toDF("id", "lat", "lon"), 1.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.0), (1L, 3L, 0.0), (2L, 3L, 0.0)))
  }

  test("result is partitioning-invariant") {
    val pts = (1L to 60L).map(i => (i, (i * 7 % 170) - 85.0, (i * 13 % 360) - 180.0))
    val df = pts.toDF("id", "lat", "lon")
    val a = Spatial.withinDistancePairs(df.repartition(1), 500.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val b = Spatial.withinDistancePairs(df.repartition(13), 500.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(a == b && a == brute(pts, 500.0))
  }

  test("radius outside (0, 1000] is rejected") {
    val df = Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon")
    intercept[IllegalArgumentException](Spatial.withinDistancePairs(df, 0.0))
    intercept[IllegalArgumentException](Spatial.withinDistancePairs(df, 1500.0))
  }
}
