package graft

import graft.sources.WsprNetClient
import graft.sources.WsprNetClient._

class WsprNetClientSpec extends SparkSpec {

  private val loginOk =
    """{"sessid":"abc123","session_name":"SESSd41d8cd98f00b204"}"""

  private def spotJson(ids: Seq[Long]) = ids.map { i =>
    s"""{"Spotnum": $i, "Date": 1614159000, "Reporter": "KD2OM", "ReporterGrid": "FN12gx",
       |"dB": -21, "MHz": 7.040172, "CallSign": "N6GN\\/P", "Grid": "DN70", "Power": 23,
       |"Drift": 0, "distance": 2543, "azimuth": 68, "Band": 7, "version": "2.3.0", "code": 1}"""
      .stripMargin.replace("\n", " ")
  }.mkString("[", ",", "]")

  /** Scripted transport: replays canned responses, records requests. */
  private class FakeTransport(script: Iterator[String]) extends HttpTransport {
    val requests = scala.collection.mutable.ArrayBuffer[(String, String, Map[String, String])]()
    def post(url: String, body: String, headers: Map[String, String]): String = {
      requests += ((url, body, headers))
      script.next()
    }
  }

  private val cfg = Config(user = "u", password = "p")

  test("login parses session fields (S1)") {
    val t = new FakeTransport(Iterator(loginOk))
    val s = login(t, cfg)
    assert(s == Session("abc123", "SESSd41d8cd98f00b204"))
    assert(t.requests.head._1.endsWith("/drupal/rest/user/login"))
  }

  test("scrape sends cursor, parses batch, unescapes callsigns (S2/P1)") {
    val t = new FakeTransport(Iterator(loginOk, spotJson(Seq(101, 102))))
    val (df, _) = scrapeOnce(spark, t, cfg, None, cursor = 100)
    assert(t.requests(1)._2.contains(""""spotnum_start":"100""""))
    assert(t.requests(1)._3("Cookie") == "SESSd41d8cd98f00b204=abc123")
    val rows = df.orderBy("Spotnum").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(101L, 102L))
    assert(rows.head.getString(6) == "N6GN/P")
  }

  test("auth failure triggers one re-login (F4)") {
    val t = new FakeTransport(Iterator(
      "you are not authorized to view this page", // fetch with stale session
      loginOk,                                    // re-login
      spotJson(Seq(7))))                          // retry fetch
    val (df, s) = scrapeOnce(spark, t, cfg, Some(Session("stale", "SESSX")), 0)
    assert(df.count() == 1)
    assert(s.sessid == "abc123") // fresh session kept for reuse
    assert(t.requests.length == 3)
  }

  test("empty batch yields empty typed DataFrame, no error (F5)") {
    val t = new FakeTransport(Iterator(loginOk, """{"error":"no new spots"}"""))
    val (df, _) = scrapeOnce(spark, t, cfg, None, 0)
    assert(df.count() == 0)
    assert(df.schema == graft.spots.SpotSchema.apiSchema)
  }

  test("exclude_special flag shape (F3): default off, opt-in sends 1") {
    val t = new FakeTransport(Iterator(loginOk, spotJson(Seq(1)),
      loginOk, spotJson(Seq(1))))
    scrapeOnce(spark, t, cfg, None, 0)
    assert(t.requests(1)._2.contains(""""exclude_special":"0""""))
    scrapeOnce(spark, t, cfg.copy(excludeSpecial = true), None, 0)
    assert(t.requests(3)._2.contains(""""exclude_special":"1""""))
  }
}
