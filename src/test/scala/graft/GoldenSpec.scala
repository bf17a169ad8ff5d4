package graft

import graft.operators.Enrich
import graft.sources.SpotSource
import graft.sinks.Sinks
import java.nio.file.Files

/** Byte-level golden pin of the enriched output (SURVEY.md §5): any change to
  * enrichment math, formatting, or column order breaks these literals. */
class GoldenSpec extends SparkSpec {

  private val inputJson =
    """[
      | {"Spotnum": 2769426793, "Date": 1614159000, "Reporter": "KD2OM", "ReporterGrid": "FN12gx",
      |  "dB": -21, "MHz": 7.040172, "CallSign": "N6GN\/P", "Grid": "DN70", "Power": 23,
      |  "Drift": 0, "distance": 2543, "azimuth": 68, "Band": 7, "version": "2.3.0", "code": 1},
      | {"Spotnum": 2769426794, "Date": 1614159060, "Reporter": "W1AW", "ReporterGrid": "FN31",
      |  "dB": -10, "MHz": 14.097100, "CallSign": "K1JT", "Grid": "FN31", "Power": 30,
      |  "Drift": 1, "distance": 0, "azimuth": 0, "Band": 14, "version": "2.3.0", "code": 0}
      |]""".stripMargin

  // Pinned from the first verified implementation (cross-checked against the
  // reference math re-implementation in RefMath and the DuckDB oracle).
  // Spot 2: tx == rx locator (zero-distance, same-meridian degenerate case).
  private val golden = Seq(
    "2021-02-24:09:30,2769426793,1614159000,KD2OM,FN12gx,-21,7.040172,N6GN/P,DN70,23,0,2543,68,7,2.3.0,1,40,-999.9,-999.9,273,42.979,-77.458,74,40.500,-105.000,43.039,-81.156",
    "2021-02-24:09:31,2769426794,1614159060,W1AW,FN31,-10,14.0971,K1JT,FN31,30,1,0,0,14,2.3.0,0,20,-999.9,-999.9,0,41.500,-73.000,0,41.500,-73.000,41.500,-73.000")

  test("enriched CSV output is byte-identical to the pinned golden lines") {
    val dir = Files.createTempDirectory("golden").toString
    Files.writeString(java.nio.file.Path.of(dir, "in.json"), inputJson)
    Sinks.writeCsv27(
      Enrich.formatted(SpotSource.sorted(SpotSource.fromJson(spark, s"$dir/in.json"))),
      s"$dir/out")
    val lines = Files.list(java.nio.file.Path.of(dir, "out")).toArray
      .map(_.toString).filter(_.endsWith(".csv"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq)
      .sortBy(_.split(",")(1))
    assert(lines.toSeq == golden)
  }
}
