package graft.spots

import org.apache.spark.sql.types._

/** Canonical spot schemas.
  *
  * The reference pipeline carries one logical entity — the WSPR "spot" — through
  * three representations: a 15-field API JSON object, a 16-column normalized CSV
  * (wd_time prepended), and a 27-column enriched CSV (11 wd_* columns appended)
  * (reference: wsprnet_azi_calc.py:23-53, wsprnet-scraper.sh:258-259).
  *
  * The reference keeps everything stringly-typed and coerces at use sites; here
  * each field gets its natural Catalyst type so plans stay codegen-friendly and
  * Parquet scans prune/push down properly.
  */
object SpotSchema {

  /** The 15 API fields, in the reference's declared order
    * (wsprnet_azi_calc.py:23-40 minus wd_time; wsprnet-scraper.sh:258-259). */
  val apiColumns: Seq[String] = Seq(
    "Spotnum", "Date", "Reporter", "ReporterGrid", "dB", "MHz", "CallSign",
    "Grid", "Power", "Drift", "distance", "azimuth", "Band", "version", "code")

  /** 16-column normalized layout: wd_time first (wsprnet-scraper.sh:313-323). */
  val csv16Columns: Seq[String] = "wd_time" +: apiColumns

  /** The 11 enrichment columns (wsprnet_azi_calc.py:41-53). */
  val enrichmentColumns: Seq[String] = Seq(
    "wd_band", "wd_c2_noise", "wd_rms_noise", "wd_rx_az", "wd_rx_lat",
    "wd_rx_lon", "wd_tx_az", "wd_tx_lat", "wd_tx_lon", "wd_v_lat", "wd_v_lon")

  /** Full 27-column enriched order (insert-spots.sql:1-3). */
  val enriched27Columns: Seq[String] = csv16Columns ++ enrichmentColumns

  /** Typed schema for the API JSON batch. */
  val apiSchema: StructType = StructType(Seq(
    StructField("Spotnum", LongType),
    StructField("Date", LongType),              // epoch seconds
    StructField("Reporter", StringType),
    StructField("ReporterGrid", StringType),    // rx Maidenhead locator, 4/6 char
    StructField("dB", IntegerType),
    StructField("MHz", DoubleType),
    StructField("CallSign", StringType),
    StructField("Grid", StringType),            // tx Maidenhead locator
    StructField("Power", IntegerType),
    StructField("Drift", IntegerType),
    StructField("distance", IntegerType),
    StructField("azimuth", IntegerType),
    StructField("Band", IntegerType),
    StructField("version", StringType),
    StructField("code", IntegerType)))

  /** Typed schema for the 16-column normalized CSV (no header). */
  val csv16Schema: StructType =
    StructType(StructField("wd_time", StringType) +: apiSchema.fields.toSeq)

  /** Typed schema of the 27-column enriched output. Lat/lon and noise columns are
    * strings at this boundary because the reference emits %.3f-formatted strings
    * (wsprnet_azi_calc.py:175-181); in-plan they are doubles until the final select.
    */
  val enriched27Schema: StructType = StructType(csv16Schema.fields.toSeq ++ Seq(
    StructField("wd_band", IntegerType),
    StructField("wd_c2_noise", StringType),
    StructField("wd_rms_noise", StringType),
    StructField("wd_rx_az", IntegerType),
    StructField("wd_rx_lat", StringType),
    StructField("wd_rx_lon", StringType),
    StructField("wd_tx_az", IntegerType),
    StructField("wd_tx_lat", StringType),
    StructField("wd_tx_lon", StringType),
    StructField("wd_v_lat", StringType),
    StructField("wd_v_lon", StringType)))

  /** Typed surface for Dataset[Spot] users. */
  case class Spot(
      Spotnum: Long,
      Date: Long,
      Reporter: String,
      ReporterGrid: String,
      dB: Int,
      MHz: Double,
      CallSign: String,
      Grid: String,
      Power: Int,
      Drift: Int,
      distance: Int,
      azimuth: Int,
      Band: Int,
      version: String,
      code: Int)

  /** wd_time format: non-ISO `:` separator between date and time, UTC
    * (wsprnet-scraper.sh:320, wsprnet_azi_calc.py:196). */
  val WdTimeFormat = "yyyy-MM-dd:HH:mm"
}
