package graft

import graft.operators.Enrich
import graft.sinks.Sinks
import graft.sources.{SpotSource, SpotSynth}
import java.nio.file.Files

class SourceSinkSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val jsonFixture =
    """[
      |  {"Spotnum": 100, "Date": 1614159000, "Reporter": "KD2OM", "ReporterGrid": "FN12gx",
      |   "dB": -21, "MHz": 7.040172, "CallSign": "N6GN\/P", "Grid": "DN70", "Power": 23,
      |   "Drift": 0, "distance": 2543, "azimuth": 68, "Band": 7, "version": "2.3.0",
      |   "code": 1, "UnknownKey": "drop-me"},
      |  {"Spotnum": 99, "Date": 1614159000, "Reporter": "W1AW", "ReporterGrid": "FN31",
      |   "dB": -10, "MHz": 14.097100, "CallSign": "K1JT", "Grid": "FN20", "Power": 30,
      |   "Drift": 1, "distance": 100, "azimuth": 10, "Band": 14, "version": "2.3.0", "code": 0}
      |]""".stripMargin

  test("JSON source: schema-on-read drops unknown keys, unescapes callsigns (S5/P1/P2)") {
    val dir = tmp("json-src")
    Files.writeString(java.nio.file.Path.of(dir, "batch.json"), jsonFixture)
    val df = SpotSource.fromJson(spark, s"$dir/batch.json")
    assert(df.columns.toSeq == graft.spots.SpotSchema.apiColumns)
    val rows = SpotSource.sorted(df).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(99L, 100L)) // numeric sort (O1)
    assert(rows(1).getString(6) == "N6GN/P") // JSON reader resolved \/
  }

  test("typed Dataset[Spot] surface: encode, filter, and map with field checks") {
    import graft.spots.SpotSchema.Spot
    import spark.implicits._
    val dir = tmp("typed")
    Files.writeString(java.nio.file.Path.of(dir, "batch.json"), jsonFixture)
    val ds = SpotSource.fromJson(spark, s"$dir/batch.json").as[Spot]
    val strong = ds.filter(_.dB > -15).map(s => (s.CallSign, s.MHz)).collect()
    assert(strong.toSeq == Seq(("K1JT", 14.0971)))
    assert(ds.map(_.Spotnum).collect().sorted.toSeq == Seq(99L, 100L))
  }

  test("CSV source: malformed rows silently dropped (S4/F2)") {
    val dir = tmp("csv-src")
    val csv =
      """2021-02-24:09:30,100,1614159000,KD2OM,FN12gx,-21,7.040172,N6GN/P,DN70,23,0,2543,68,7,2.3.0,1
        |THIS,ROW,IS,MALFORMED
        |2021-02-24:09:30,101,1614159000,W1AW,FN31,-10,14.0971,K1JT,FN20,30,1,100,10,14,2.3.0,0""".stripMargin
    Files.writeString(java.nio.file.Path.of(dir, "spots.csv"), csv)
    val df = SpotSource.fromCsv16(spark, s"$dir/spots.csv")
    assert(df.count() == 2)
    // dispatch by extension (S6)
    assert(SpotSource.load(spark, s"$dir/spots.csv").count() == 2)
  }

  test("CSV 27-col sink roundtrip (K2) keeps values and order") {
    val dir = tmp("csv-sink")
    val enriched = Enrich.formatted(
      SpotSynth.fromDir(spark, "/root/testdata/sf0.001").limit(50))
    Sinks.writeCsv27(enriched, s"$dir/out")
    val back = SpotSource.fromCsv27(spark, s"$dir/out")
    assert(back.count() == 50)
    val a = enriched.orderBy("Spotnum").collect().map(_.toSeq.map(String.valueOf))
    val b = back.orderBy("Spotnum").collect().map(_.toSeq.map(String.valueOf))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("JDBC sink (K3): batched append into Derby with mixed-case identifiers") {
    val url = "jdbc:derby:memory:spotsdb;create=true"
    val enriched = Enrich.formatted(
      SpotSynth.fromDir(spark, "/root/testdata/sf0.001").limit(30))
    Sinks.jdbcAppend(enriched, url, "spots", batchSize = 10)
    val back = spark.read.jdbc(url, "spots", new java.util.Properties())
    assert(back.count() == 30)
    assert(back.columns.toSeq == graft.spots.SpotSchema.enriched27Columns)
    // append again: INSERT-only at-least-once parity (no upsert), count doubles
    Sinks.jdbcAppend(enriched, url, "spots", batchSize = 10)
    assert(spark.read.jdbc(url, "spots", new java.util.Properties()).count() == 60)
  }

  test("JDBC upsert: replayed batches are no-ops (exactly-once contents)") {
    val url = "jdbc:derby:memory:upsertdb;create=true"
    val enriched = Enrich.formatted(
      SpotSynth.fromDir(spark, "/root/testdata/sf0.001").limit(20))
    Sinks.jdbcUpsert(enriched, url, "spots_u", "Spotnum")        // creates
    Sinks.jdbcUpsert(enriched, url, "spots_u", "Spotnum")        // replay: no-op
    val overlap = Enrich.formatted(
      SpotSynth.fromDir(spark, "/root/testdata/sf0.001").limit(30)) // 10 new
    Sinks.jdbcUpsert(overlap, url, "spots_u", "Spotnum")
    val back = spark.read.jdbc(url, "spots_u", new java.util.Properties())
    assert(back.count() == 30)
    assert(back.select("Spotnum").distinct().count() == 30)
  }

  test("JDBC upsert quotes identifiers: mixed-case table and key survive MERGE/DROP") {
    val url = "jdbc:derby:memory:quotedb;create=true"
    val enriched = Enrich.formatted(
      SpotSynth.fromDir(spark, "/root/testdata/sf0.001").limit(10))
    Sinks.jdbcUpsert(enriched, url, "SpotsMixed", "Spotnum")     // creates
    Sinks.jdbcUpsert(enriched, url, "SpotsMixed", "Spotnum")     // replay via MERGE
    val back = spark.read.jdbc(url, "SpotsMixed", new java.util.Properties())
    assert(back.count() == 10)
    assert(back.select("Spotnum").distinct().count() == 10)
  }

  test("compressed spool queue (K4): unique batch dirs, bz2 payload, no overwrite") {
    val dir = tmp("spool")
    val enriched = Enrich.formatted(
      SpotSynth.fromDir(spark, "/root/testdata/sf0.001").limit(10))
    Sinks.spoolCompressed(enriched, dir, batchTag = 1700000001L)
    Sinks.spoolCompressed(enriched, dir, batchTag = 1700000002L)
    val files = java.nio.file.Files.walk(java.nio.file.Path.of(dir)).toArray
      .map(_.toString).filter(_.endsWith(".csv.bz2"))
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("batch_1700000001") || f.contains("batch_1700000002")))
    // same tag again must refuse (queue entries are immutable)
    intercept[Exception] {
      Sinks.spoolCompressed(enriched, dir, batchTag = 1700000001L)
    }
    // payload is readable back as the 27-col format
    assert(SpotSource.fromCsv27(spark, s"$dir/batch_1700000001").count() == 10)
  }

  test("spool drain (K4): retries failures, drains committed batches in order") {
    import java.nio.file.{Files, Path}
    val dir = tmp("drain")
    val enriched = Enrich.formatted(
      SpotSynth.fromDir(spark, "/root/testdata/sf0.001").limit(10))
    Sinks.spoolCompressed(enriched, dir, batchTag = 1L)
    Sinks.spoolCompressed(enriched, dir, batchTag = 2L)
    // an UNCOMMITTED batch (no _SUCCESS) must be skipped by the drain
    val inflight = Path.of(dir, "batch_3")
    Files.createDirectories(inflight)
    Files.writeString(inflight.resolve("part-x.csv.bz2"), "partial")

    // first sweep: transport rejects batch_2's payloads — they are retained
    var seen = Vector.empty[String]
    val (up1, fail1) = graft.sinks.SpoolDrain.drainOnce(dir, p => {
      seen :+= p.toString
      !p.toString.contains("batch_2")
    })
    assert(up1 >= 1 && fail1 >= 1)
    assert(seen == seen.sorted, "payloads must drain in deterministic order")
    assert(!Files.exists(Path.of(dir, "batch_1")), "drained batch dir is removed")
    assert(Files.exists(Path.of(dir, "batch_2")), "failed payloads are retained")
    assert(Files.exists(inflight.resolve("part-x.csv.bz2")), "uncommitted batch untouched")

    // second sweep with a working transport drains the retained batch
    val (up2, fail2) = graft.sinks.SpoolDrain.drainOnce(dir, _ => true)
    assert(up2 == fail1 && fail2 == 0)
    assert(!Files.exists(Path.of(dir, "batch_2")))

    // empty queue: clean no-op
    assert(graft.sinks.SpoolDrain.drainOnce(dir, _ => true) == ((0, 0)))
  }

  test("multi-sink fan-out (K5) writes the same batch to both sinks") {
    val dir = tmp("fanout")
    val enriched = Enrich.formatted(
      SpotSynth.fromDir(spark, "/root/testdata/sf0.001").limit(20))
    Sinks.fanOut(enriched, Seq(
      df => Sinks.writeCsv27(df, s"$dir/a"),
      df => df.write.mode("overwrite").parquet(s"$dir/b")))
    assert(SpotSource.fromCsv27(spark, s"$dir/a").count() == 20)
    assert(spark.read.parquet(s"$dir/b").count() == 20)
  }
}
