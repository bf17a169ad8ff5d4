package graft

import graft.functions.Geo
import graft.sources.SpotSynth
import org.apache.spark.sql.functions._

/** The synthesized spot batch must actually cover the reference's edge cases
  * (FIXTURES.md) — otherwise the oracle checks prove less than they claim. */
class SpotSynthSpec extends SparkSpec {

  private lazy val sp = SpotSynth.fromDir(spark, "/root/testdata/sf0.001").cache()

  test("locators are valid 4/6-char Maidenhead in all three case modes") {
    val bad = sp.filter(
      !col("Grid").rlike("^[A-R]{2}[0-9]{2}([a-x]{2}|[A-X]{2})?$") ||
      !col("ReporterGrid").rlike("^[A-R]{2}[0-9]{2}([a-x]{2}|[A-X]{2})?$")).count()
    assert(bad == 0)
    assert(sp.filter(col("ReporterGrid").rlike("^[A-R]{2}[0-9]{2}$")).count() > 0)
    assert(sp.filter(col("ReporterGrid").rlike("[a-x]{2}$")).count() > 0)
    assert(sp.filter(col("ReporterGrid").rlike("[A-X]{2}$")).count() > 0)
  }

  test("exact same-meridian tx/rx pairs exist (vertex special case)") {
    val n = sp.filter(Geo.locLon(col("Grid")) === Geo.locLon(col("ReporterGrid"))).count()
    assert(n > 0, "no same-meridian pairs — vertex branch untested by oracle")
  }

  test("all 18 band-map entries + unknown band are exercised") {
    val bands = sp.select(Geo.bandOf(col("MHz")).as("b")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(bands.count(_ != 9999) == 17, s"got $bands") // 60m appears once (two freqs -> one code)
    assert(bands.contains(9999))
    // both 60m entries (52 and 53 keys) map in, via distinct MHz count
    assert(sp.select("MHz").distinct().count() == 20)
  }

  test("Spotnum is unique and monotone-aligned with events") {
    assert(sp.select("Spotnum").distinct().count() == sp.count())
  }
}
