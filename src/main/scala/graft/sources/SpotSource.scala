package graft.sources

import graft.spots.SpotSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch readers for the reference's two spot wire formats
  * (reference: wsprnet_azi_calc.py:142-147, :186-188, :215-223;
  * wsprnet-scraper.sh:258-269).
  *
  * Schema-on-read replaces the reference's sed normalize pipeline: a real JSON
  * reader makes the `\/` unescape and key-filter projection free; explicit
  * StructTypes mean unknown keys are dropped by construction
  * (wsprnet_azi_calc.py:194) and the CSV reader's DROPMALFORMED mirrors
  * `loose=True, invalid_raise=False` (wsprnet_azi_calc.py:145).
  */
object SpotSource {

  /** JSON array of API spot objects (S5). The JSON parser already resolves
    * `\/` escapes (the reference strips them with sed, wsprnet-scraper.sh:266);
    * [[cleanCallsigns]] additionally drops stray literal backslashes that
    * survive a non-JSON upstream. */
  def fromJson(spark: SparkSession, path: String): DataFrame =
    cleanCallsigns(
      spark.read.schema(SpotSchema.apiSchema)
        .option("multiLine", value = true).json(path)
        .select(SpotSchema.apiColumns.map(col): _*))

  /** 16-column normalized CSV, no header; malformed rows silently dropped (S4).
    * DROPMALFORMED alone is projection-dependent under CSV column pruning
    * (a count() parses no columns and drops nothing), so rows whose Spotnum
    * fails to parse are additionally filtered out — the deterministic form of
    * the reference's skip-bad-rows behavior. */
  def fromCsv16(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(SpotSchema.csv16Schema)
      .option("mode", "DROPMALFORMED").option("header", value = false)
      .csv(path)
      .filter(col("Spotnum").isNotNull)

  /** 27-column enriched CSV (S7, upload side). */
  def fromCsv27(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(SpotSchema.enriched27Schema)
      .option("mode", "DROPMALFORMED").option("header", value = false)
      .csv(path)
      .filter(col("Spotnum").isNotNull)

  /** Format dispatch by extension (S6): `.csv` -> CSV, otherwise JSON. */
  def load(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv")) fromCsv16(spark, path) else fromJson(spark, path)

  /** P1 callsign cleanup: remove backslash escapes (`N6GN\/P` -> `N6GN/P`). */
  def cleanCallsigns(df: DataFrame): DataFrame = {
    val cleaned = Seq("CallSign", "Reporter").foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, regexp_replace(col(c), "\\\\", ""))
      else d
    }
    cleaned
  }

  /** O1: batch ordered by Spotnum — numeric, the stated intent of the
    * reference's lexicographic line sort (wsprnet-scraper.sh:267). */
  def sorted(df: DataFrame): DataFrame = df.orderBy("Spotnum")
}
