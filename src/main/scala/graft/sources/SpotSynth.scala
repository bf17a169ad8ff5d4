package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic spot-batch synthesis from the driver's `events` fixture table.
  *
  * The correctness harness (Verify + DuckDB oracle) runs over the shared parquet
  * fixtures, which contain no WSPR spots; this object derives a spot batch from
  * `events` (monotonic event_id <-> Spotnum, ts <-> Date, per TESTDATA.md) with
  * pure arithmetic that is expressed IDENTICALLY here (Spark Columns) and in
  * [[sqlCte]] (DuckDB SQL), so every spot-pipeline operator can be oracle-checked.
  *
  * The derivation covers the reference's edge cases (FIXTURES.md):
  * 4-char, 6-char-lower and 6-char-upper locators (u%3 / e%3 arms), exact
  * same-meridian tx/rx pairs (e%11==0 with u%3==0 copies the rx longitude
  * characters into the tx locator), all 18 band-map entries plus 2
  * unknown-band frequencies (e%20 indexes [[freqs]]).
  */
object SpotSynth {

  private val L18 = "ABCDEFGHIJKLMNOPQR"
  private val L24U = "ABCDEFGHIJKLMNOPQRSTUVWX"
  private val L24L = L24U.toLowerCase
  private val DIG = "0123456789"

  /** 20 frequencies: one per band-map entry (mid-band, so trunc(10*MHz) hits the
    * reference's key exactly; wsprnet_azi_calc.py:55-75) + 2 unknown-band. */
  val freqs: Seq[Double] = Seq(
    0.137500, 0.475700, 1.838100, 3.570100, 5.288700, 5.364700, 7.040100,
    10.140200, 14.097100, 18.106100, 21.096100, 24.926100, 28.126100,
    50.294500, 70.091000, 144.489500, 432.300500, 1296.501500,
    2.500000, 99.999900)

  private def pick(alphabet: String, idx: Column): Column =
    substr(lit(alphabet), (idx + 1).cast("int"), lit(1))

  /** Derive the 15-column API-shaped spot batch from an events DataFrame. */
  def fromEvents(events: DataFrame): DataFrame = {
    val e = col("event_id")
    val u = col("user_id")
    val rf1 = pick(L18, (u * 7 + 3) % 18)
    val rf2 = pick(L18, (u * 13 + 5) % 18)
    val rd1 = pick(DIG, (u * 3 + 1) % 10)
    val rd2 = pick(DIG, (u * 11 + 2) % 10)
    val rsub = when(u % 3 === 0, lit(""))
      .when(u % 3 === 1, concat(pick(L24L, (u * 5) % 24), pick(L24L, (u * 17 + 7) % 24)))
      .otherwise(concat(pick(L24U, (u * 5) % 24), pick(L24U, (u * 17 + 7) % 24)))
    val reporterGrid = concat(rf1, rf2, rd1, rd2, rsub)

    val tf1 = pick(L18, (e * 5 + 2) % 18)
    val tf2 = pick(L18, (e * 7 + 11) % 18)
    val td1 = pick(DIG, (e * 13 + 3) % 10)
    val td2 = pick(DIG, (e * 17 + 6) % 10)
    val tsub = when(e % 3 === 0, lit(""))
      .when(e % 3 === 1, concat(pick(L24L, (e * 19 + 4) % 24), pick(L24L, (e * 23 + 9) % 24)))
      .otherwise(concat(pick(L24U, (e * 5 + 1) % 24), pick(L24U, (e * 23 + 9) % 24)))
    // e%11==0: copy the rx longitude characters (1st and 3rd) -> exact
    // same-meridian pair whenever the rx locator is 4-char (u%3==0).
    val grid = when(e % 11 === 0, concat(rf1, tf2, rd1, td2))
      .otherwise(concat(tf1, tf2, td1, td2, tsub))

    val dateCol = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000") // raw nanos
      case _ => unix_timestamp(col("ts"))
    }
    events.select(
      e.as("Spotnum"),
      dateCol.as("Date"),
      concat(lit("R"), (u % 100).cast("string")).as("Reporter"),
      reporterGrid.as("ReporterGrid"),
      (e % 50 - 35).cast("int").as("dB"),
      element_at(typedLit(freqs), (e % 20 + 1).cast("int")).as("MHz"),
      concat(lit("T"), (e % 97).cast("string")).as("CallSign"),
      grid.as("Grid"),
      ((e % 19) * 3 - 10).cast("int").as("Power"),
      (e % 9 - 4).cast("int").as("Drift"),
      ((e * 37) % 20000).cast("int").as("distance"),
      ((e * 31) % 360).cast("int").as("azimuth"),
      (e % 30).cast("int").as("Band"),
      concat(lit("2."), (e % 3).cast("string"), lit("."), (u % 5).cast("string")).as("version"),
      (e % 4).cast("int").as("code"))
  }

  def fromDir(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(spark.read.parquet(s"$sfDir/events.parquet"))

  /** The same derivation as a DuckDB CTE body (`SELECT ... FROM events`).
    * Kept textually parallel to [[fromEvents]] — any change must touch both. */
  val sqlCte: String = {
    def pickSql(alphabet: String, idx: String): String =
      s"substr('$alphabet', CAST(($idx) + 1 AS INT), 1)"
    val rf1 = pickSql(L18, "(u*7+3) % 18")
    val rf2 = pickSql(L18, "(u*13+5) % 18")
    val rd1 = pickSql(DIG, "(u*3+1) % 10")
    val rd2 = pickSql(DIG, "(u*11+2) % 10")
    val rsub = s"CASE WHEN u % 3 = 0 THEN '' WHEN u % 3 = 1 THEN " +
      s"${pickSql(L24L, "(u*5) % 24")} || ${pickSql(L24L, "(u*17+7) % 24")} ELSE " +
      s"${pickSql(L24U, "(u*5) % 24")} || ${pickSql(L24U, "(u*17+7) % 24")} END"
    val tf1 = pickSql(L18, "(e*5+2) % 18")
    val tf2 = pickSql(L18, "(e*7+11) % 18")
    val td1 = pickSql(DIG, "(e*13+3) % 10")
    val td2 = pickSql(DIG, "(e*17+6) % 10")
    val tsub = s"CASE WHEN e % 3 = 0 THEN '' WHEN e % 3 = 1 THEN " +
      s"${pickSql(L24L, "(e*19+4) % 24")} || ${pickSql(L24L, "(e*23+9) % 24")} ELSE " +
      s"${pickSql(L24U, "(e*5+1) % 24")} || ${pickSql(L24U, "(e*23+9) % 24")} END"
    // e0 exponent form => DOUBLE literals in DuckDB (plain decimals parse as DECIMAL)
    val freqList = freqs.map(f => f"$f%.6fe0").mkString("[", ", ", "]")
    s"""SELECT
       |  e AS "Spotnum",
       |  epoch_us(ts) // 1000000 AS "Date",
       |  'R' || (u % 100) AS "Reporter",
       |  $rf1 || $rf2 || $rd1 || $rd2 || $rsub AS "ReporterGrid",
       |  CAST(e % 50 - 35 AS INT) AS "dB",
       |  ($freqList)[CAST(e % 20 + 1 AS INT)] AS "MHz",
       |  'T' || (e % 97) AS "CallSign",
       |  CASE WHEN e % 11 = 0 THEN $rf1 || $tf2 || $rd1 || $td2
       |       ELSE $tf1 || $tf2 || $td1 || $td2 || $tsub END AS "Grid",
       |  CAST((e % 19) * 3 - 10 AS INT) AS "Power",
       |  CAST(e % 9 - 4 AS INT) AS "Drift",
       |  CAST((e * 37) % 20000 AS INT) AS "distance",
       |  CAST((e * 31) % 360 AS INT) AS "azimuth",
       |  CAST(e % 30 AS INT) AS "Band",
       |  '2.' || (e % 3) || '.' || (u % 5) AS "version",
       |  CAST(e % 4 AS INT) AS "code"
       |FROM (SELECT event_id AS e, user_id AS u, ts FROM events) _ev
       |""".stripMargin
  }
}
