package graft

import graft.sources.WsprNetClient.HttpTransport
import graft.sources.v2.{SpotJson, SpotnumOffset, WsprNetSourceProvider}
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** DataSource V2 micro-batch connector: the Spotnum cursor as a real stream
  * offset, checkpointed by the engine's offset log (S2/S3 in DSv2 form). */
class WsprNetV2SourceSpec extends SparkSpec {

  private val loginOk =
    """{"sessid":"abc123","session_name":"SESSd41d8cd98f00b204"}"""

  private def spotJson(ids: Seq[Long]) = ids.map { i =>
    s"""{"Spotnum": $i, "Date": ${1614159000L + i}, "Reporter": "R$i",
       |"ReporterGrid": "FN12gx", "dB": -21, "MHz": 7.040172, "CallSign": "T$i",
       |"Grid": "DN70", "Power": 23, "Drift": 0, "distance": 1, "azimuth": 1,
       |"Band": 7, "version": "2.3.0", "code": 1}""".stripMargin.replace("\n", " ")
  }.mkString("[", ",", "]")

  /** Cursor-aware API double: serves whatever is `available` past the
    * requested spotnum_start, like the real endpoint. */
  private class ApiDouble(@volatile var available: Seq[Long]) extends HttpTransport {
    def post(url: String, body: String, headers: Map[String, String]): String =
      if (url.endsWith("/drupal/rest/user/login")) loginOk
      else {
        val cur = """"spotnum_start":"(-?\d+)"""".r.findFirstMatchIn(body)
          .map(_.group(1).toLong).getOrElse(0L)
        val ids = available.filter(_ > cur)
        if (ids.isEmpty) """{"error":"no new spots"}""" else spotJson(ids)
      }
  }

  private val fmt = classOf[WsprNetSourceProvider].getName

  test("micro-batch polling: cursor advances as the offset, restart resumes from the log") {
    val api = new ApiDouble(1L to 10L)
    WsprNetSourceProvider.registerTransport("t1", api)
    val ckpt = Files.createTempDirectory("v2-ckpt").toString
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    // foreachBatch sink: supports checkpoint recovery (memory sink does not)
    def startQuery() = spark.readStream.format(fmt)
      .option("transportId", "t1").option("user", "u").option("password", "p")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("Spotnum").collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = startQuery()
    q1.processAllAvailable()
    assert(seen.size() == 10)

    // the API re-serves an overlap; only ids past the offset are ingested
    api.available = 5L to 15L
    q1.processAllAvailable()
    assert(seen.asScala.toSeq.sorted == (1L to 15L),
      s"overlap must dedup via the offset: ${seen.asScala.toSeq.sorted}")
    q1.stop()

    // restart against the same checkpoint: the offset log (not a sink scan,
    // not a cursor file) prevents re-ingesting 5..15
    seen.clear()
    val q2 = startQuery()
    q2.processAllAvailable()
    assert(seen.isEmpty, s"restart must resume past 15, re-ingested: ${seen.asScala}")
    api.available = Seq(16L)
    q2.processAllAvailable()
    assert(seen.asScala.toSeq == Seq(16L))
    q2.stop()
  }

  test("uncommitted-batch replay in a fresh JVM refetches the planned range") {
    // simulates restart: a brand-new stream (empty buffer) is asked to
    // re-execute (10, 15] straight from the offset log
    val api = new ApiDouble(1L to 20L)
    WsprNetSourceProvider.registerTransport("t-replay", api)
    val opts = new java.util.HashMap[String, String]()
    opts.put("transportId", "t-replay"); opts.put("user", "u"); opts.put("password", "p")
    val stream = new graft.sources.v2.WsprNetMicroBatchStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
    val parts = stream.planInputPartitions(SpotnumOffset(10), SpotnumOffset(15))
    assert(parts.length == 1)
    val reader = new graft.sources.v2.SpotRowsReaderFactory().createReader(parts.head)
    val got = Iterator.continually(reader)
      .takeWhile(_.next()).map(_.get().getLong(0)).toSeq
    assert(got == (11L to 15L), s"replayed range must be refetched exactly: $got")
    // the refetched tail past the replay window stays buffered for the next
    // trigger instead of being lost
    val next = stream.planInputPartitions(SpotnumOffset(15), SpotnumOffset(20))
    assert(next.length == 1)
  }

  test("offset round-trips through its JSON form") {
    val s = new graft.sources.v2.WsprNetSourceProvider()
    assert(SpotnumOffset(42L).json() == """{"spotnum":42}""")
    assert(s != null)
  }

  test("row parsing: array and map payload forms, escapes, typed nulls") {
    val arr = SpotJson.parseRows(
      """[{"Spotnum": 7, "Date": 1, "Reporter": "A\/B", "dB": -3, "MHz": "7.04"}]""")
    assert(arr.length == 1)
    val r = arr.head
    assert(r(0) == 7L && r(2) == "A/B" && r(4) == -3 && r(5) == 7.04)
    assert(r(6) == null, "absent fields parse as typed nulls")
    val map = SpotJson.parseRows(
      """{"1":{"Spotnum": 8, "Date": 2},"2":{"Spotnum": 9, "Date": 3}}""")
    assert(map.map(_(0)) == Seq(8L, 9L))
  }
}
