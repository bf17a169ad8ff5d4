package graft.sources

import graft.spots.SpotSchema
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side connector for the wsprnet.org spot API — the reference's
  * login + incremental-fetch operators (S1/S2, wsprnet-scraper.sh:169-255)
  * behind an injectable [[HttpTransport]] so the pipeline is testable offline
  * and the zero-egress build never dials out.
  *
  * The connector is deliberately thin: it owns the session token, the cursor
  * request body, and failure classification (F4 auth, F5 empty); everything
  * downstream of the raw JSON string is the Spark plan (SpotSource.fromJson
  * semantics via spark.read.json on an in-memory Dataset).
  */
object WsprNetClient {

  /** One HTTP POST: (url, body, headers) -> response body. */
  trait HttpTransport {
    def post(url: String, body: String, headers: Map[String, String]): String
  }

  /** java.net.http implementation for production use (S1/S2 timeouts:
    * login 60 s, fetch 120 s — wsprnet-scraper.sh:171, :233). One client per
    * transport: keep-alive connections are reused across the poll loop. */
  final class JdkTransport(timeoutSeconds: Long) extends HttpTransport {
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    def post(url: String, body: String, headers: Map[String, String]): String = {
      val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      headers.foreach { case (k, v) => builder.header(k, v) }
      client.send(builder.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    }
  }

  case class Session(sessid: String, sessionName: String) {
    def cookie: String = s"$sessionName=$sessid"
  }

  case class Config(
      baseUrl: String = "http://wsprnet.org",
      user: String = "",
      password: String = "",
      excludeSpecial: Boolean = false, // F3; reference sends contradictory flags, default off
      loginTimeoutSeconds: Long = 60,
      fetchTimeoutSeconds: Long = 120)

  final class AuthFailure(msg: String) extends RuntimeException(msg)

  /** S1: POST credentials to the Drupal REST login; parse sessid/session_name.
    * Credentials are user input — escaped (graft.util.Json). */
  def login(transport: HttpTransport, cfg: Config): Session = {
    val body =
      s"""{"name":${graft.util.Json.quote(cfg.user)},"pass":${graft.util.Json.quote(cfg.password)}}"""
    val resp = transport.post(s"${cfg.baseUrl}/drupal/rest/user/login",
      body, Map("Content-Type" -> "application/json"))
    val sessid = """"sessid"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(resp).map(_.group(1))
    val name = """"session_name"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(resp).map(_.group(1))
    (sessid, name) match {
      case (Some(s), Some(n)) => Session(s, n)
      case _ => throw new AuthFailure(s"login response missing session fields")
    }
  }

  /** S2: fetch all spots with Spotnum > cursor as a raw JSON string.
    * Returns None for an empty batch (F5: no "Spotnum" in the payload);
    * throws AuthFailure on the reference's "not authorized" marker (F4). */
  def fetchRaw(transport: HttpTransport, cfg: Config, session: Session,
      cursor: Long): Option[String] = {
    val flag = if (cfg.excludeSpecial) "1" else "0"
    val body =
      s"""{"spotnum_start":"$cursor","band":"All","callsign":"","reporter":"","exclude_special":"$flag"}"""
    val resp = transport.post(s"${cfg.baseUrl}/drupal/wsprnet/spots/json",
      body, Map("Content-Type" -> "application/json", "Cookie" -> session.cookie))
    if (resp.contains("not authorized")) throw new AuthFailure("session rejected")
    if (!resp.contains("Spotnum")) None else Some(resp)
  }

  /** Raw JSON batch -> typed spot DataFrame (same path as SpotSource.fromJson:
    * schema-on-read key filter + callsign cleanup). */
  def toDataFrame(spark: SparkSession, rawJson: String): DataFrame = {
    import spark.implicits._
    SpotSource.cleanCallsigns(
      spark.read.schema(SpotSchema.apiSchema)
        .json(Seq(rawJson).toDS())
        .select(SpotSchema.apiColumns.map(org.apache.spark.sql.functions.col): _*))
  }

  /** One scrape: login-if-needed, fetch past the cursor, re-login once on an
    * invalidated session (wsprnet-scraper.sh:240-243), parse. Returns the
    * (possibly empty) typed batch and the session for reuse. */
  def scrapeOnce(spark: SparkSession, transport: HttpTransport, cfg: Config,
      sessionOpt: Option[Session], cursor: Long): (DataFrame, Session) = {
    val session = sessionOpt.getOrElse(login(transport, cfg))
    val (raw, usedSession) =
      try (fetchRaw(transport, cfg, session, cursor), session)
      catch {
        case _: AuthFailure =>
          val fresh = login(transport, cfg)
          (fetchRaw(transport, cfg, fresh, cursor), fresh)
      }
    raw match {
      case Some(json) => (toDataFrame(spark, json), usedSession)
      case None => (spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], SpotSchema.apiSchema), usedSession)
    }
  }
}
