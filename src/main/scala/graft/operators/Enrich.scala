package graft.operators

import graft.functions.Geo
import graft.spots.SpotSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's per-row geodesic enrichment stage as one lazy DataFrame
  * transform: 15/16-column spot batch in, 27-column enriched batch out
  * (reference: wsprnet_azi_calc.py:142-213). Narrow (no shuffle), fully
  * whole-stage-codegen — scales linearly with input splits.
  */
object Enrich {

  /** Adds the 11 wd_* enrichment columns with natural types (doubles for
    * lat/lon, ints for azimuths/band). Keeps numeric precision in-plan;
    * use [[formatted]] for the reference's string-formatted 27-col boundary.
    * Also derives wd_time from Date if absent (wsprnet_azi_calc.py:196).
    */
  def enrich(df: DataFrame): DataFrame = {
    val withTime =
      if (df.columns.contains("wd_time")) df
      else df.withColumn(
        "wd_time", from_unixtime(col("Date"), SpotSchema.WdTimeFormat))
    withTime
      .withColumn("wd_tx_lat", Geo.locLat(col("Grid")))
      .withColumn("wd_tx_lon", Geo.locLon(col("Grid")))
      .withColumn("wd_rx_lat", Geo.locLat(col("ReporterGrid")))
      .withColumn("wd_rx_lon", Geo.locLon(col("ReporterGrid")))
      .withColumn("wd_rx_az_d", Geo.rxAzimuth(
        col("wd_tx_lat"), col("wd_tx_lon"), col("wd_rx_lat"), col("wd_rx_lon")))
      .withColumn("wd_tx_az_d", Geo.txAzimuth(
        col("wd_tx_lat"), col("wd_tx_lon"), col("wd_rx_lat"), col("wd_rx_lon")))
      .withColumn("wd_vertex", Geo.vertex(
        col("wd_tx_lat"), col("wd_tx_lon"), col("wd_rx_lat"), col("wd_rx_lon"),
        col("wd_rx_az_d")))
      .withColumn("wd_v_lat", col("wd_vertex.vlat"))
      .withColumn("wd_v_lon", col("wd_vertex.vlon"))
      .withColumn("wd_band", Geo.bandOf(col("MHz")))
      .withColumn("wd_c2_noise", lit("-999.9"))   // placeholders, wsprnet_azi_calc.py:172-173
      .withColumn("wd_rms_noise", lit("-999.9"))
      .withColumn("wd_rx_az", round(col("wd_rx_az_d")).cast("int"))
      .withColumn("wd_tx_az", round(col("wd_tx_az_d")).cast("int"))
      .drop("wd_vertex", "wd_rx_az_d", "wd_tx_az_d")
  }

  /** The reference's exact output boundary: all 27 columns in canonical order,
    * lat/lon as %.3f strings (wsprnet_azi_calc.py:175-181, insert-spots.sql:1-3). */
  def formatted(df: DataFrame): DataFrame = {
    val enriched = enrich(df)
    val f3 = Seq("wd_rx_lat", "wd_rx_lon", "wd_tx_lat", "wd_tx_lon",
      "wd_v_lat", "wd_v_lon")
    val out = f3.foldLeft(enriched) { (d, c) =>
      d.withColumn(c, format_string("%.3f", col(c)))
    }
    out.select(SpotSchema.enriched27Columns.map(col): _*)
  }
}
