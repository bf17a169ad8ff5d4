package graft.tools

import graft.streaming.Ingest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Path}

/** End-to-end smoke of the streaming ingest surface: drop two overlapping
  * JSON batches into a directory, run the file-drop stream twice (restart in
  * between), print the sink state. */
object IngestSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val in = Files.createTempDirectory("ingest-in").toString
    val ckpt = Files.createTempDirectory("ingest-ckpt").toString
    val out = Files.createTempDirectory("ingest-out").toString + "/spots"

    def batch(ids: Seq[Long]): String = ids.map { i =>
      s"""{"Spotnum": $i, "Date": ${1614159000L + i * 60}, "Reporter": "R$i", "ReporterGrid": "FN12gx", "dB": -21, "MHz": 7.040172, "CallSign": "T$i", "Grid": "DN70", "Power": 23, "Drift": 0, "distance": 1, "azimuth": 1, "Band": 7, "version": "2.3.0", "code": 1}"""
    }.mkString("[", ",", "]")

    Files.writeString(Path.of(in, "b1.json"), batch(1L to 10L))
    Ingest.start(spark, in, ckpt, out, Trigger.AvailableNow()).awaitTermination()
    println("AFTER_WAVE1=" + Ingest.readSink(spark, out).count())

    Files.writeString(Path.of(in, "b2.json"), batch(5L to 15L))
    Ingest.start(spark, in, ckpt, out, Trigger.AvailableNow()).awaitTermination()
    val df = Ingest.readSink(spark, out)
    println("AFTER_WAVE2=" + df.count())
    df.orderBy("Spotnum").show(3, truncate = false)

    // freshness check: the reference's batch-size envelope is <=9999 spots per
    // scrape (wsprnet-scraper.sh:333) and the cadence budget is 30 s
    Files.writeString(Path.of(in, "b3.json"), batch(100L until 10100L))
    val t0 = System.nanoTime()
    Ingest.start(spark, in, ckpt, out, Trigger.AvailableNow()).awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"FRESHNESS_10K_SPOTS=$secs%.2f s (budget: 30 s cadence)")
    println("AFTER_WAVE3=" + Ingest.readSink(spark, out).count())
    spark.stop()
  }
}
