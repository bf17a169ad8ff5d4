package graft

import graft.functions.expressions.VectorFunctions
import graft.operators.Enrich
import graft.sources.SpotSynth
import org.apache.spark.sql.SparkSession

/** SQL-facing surface: register the fixture tables, the synthesized spot
  * batch, the enriched view, and the custom functions into a session so the
  * whole engine is reachable from `spark.sql(...)` — the reference has no SQL
  * surface; an analytics engine should. */
object Engine {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, sfDir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // wd_time and day-partition derivations are session-TZ-dependent
    // (from_unixtime); the reference mandates UTC (wsprnet-scraper.sh:17)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tableNames.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    SpotSynth.fromEvents(spark.table("events")).createOrReplaceTempView("spots")
    Enrich.enrich(spark.table("spots")).createOrReplaceTempView("spots_enriched")
    VectorFunctions.register(spark)
  }
}
