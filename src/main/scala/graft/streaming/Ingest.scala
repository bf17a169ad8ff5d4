package graft.streaming

import graft.operators.Enrich
import graft.sources.SpotSource
import graft.spots.SpotSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental ingest: the reference's polling daemon re-expressed as a
  * Structured Streaming micro-batch pipeline (reference: wsprnet-scraper.sh
  * scrape cycle :409-433, cursor :191/:341, file-drop mode :10).
  *
  * Source: a file-drop directory of JSON spot batches (the reference's own
  * alternate mode, and the test harness stand-in for the HTTP poll — the HTTP
  * fetch is driver-side connector code behind the same DataFrame boundary).
  * The checkpoint plays the role of both the pidfile mutex (exactly one
  * writer, wsprnet-scraper.sh:452-460) and the WSPRNET_LAST_SPOTNUM cursor
  * file: file-source offsets are checkpointed, so a restart resumes without
  * refetching processed batches.
  *
  * Robustness beyond parity (SURVEY.md §2 T7): `dropDuplicates("Spotnum")`
  * within the batch plus a monotonic cursor filter across batches gives
  * at-least-once -> effectively-once into an INSERT-only sink.
  */
object Ingest {

  /** The per-batch transform: normalize -> cursor dedup -> enrich (E2 inside
    * foreachBatch). Exposed for tests and for the batch CLI path. */
  def processBatch(batch: DataFrame, cursor: Long): DataFrame =
    Enrich.formatted(
      SpotSource.sorted(
        SpotSource.cleanCallsigns(batch)
          .filter(col("Spotnum") > cursor)
          .dropDuplicates("Spotnum")))

  /** Bootstrap the cursor from the sink's max Spotnum (S3 semantics,
    * wsprnet-scraper.sh:211-229) — 0 on cold start instead of the reference's
    * abort (:223-226). */
  def bootstrapCursor(spark: SparkSession, sinkParquetDir: String): Long = {
    // cold start = no COMMITTED data; a crashed first write leaves only
    // _temporary/_SUCCESS debris, which must still count as cold
    val files = Option(new java.io.File(sinkParquetDir).listFiles()).getOrElse(Array.empty)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
    if (files.isEmpty) 0L
    else {
      // an EXISTING non-empty sink that fails to read must abort, not silently
      // restart from 0 — cursor 0 re-ingests the whole history as duplicates
      spark.read.parquet(sinkParquetDir)
        .agg(max(col("Spotnum").cast("long"))).first() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
    }
  }

  /** Start the streaming ingest: JSON file-drop -> enrich -> parquet append.
    * The cross-batch cursor survives restarts by re-bootstrapping from the
    * sink itself, so duplicates in re-dropped files are filtered even across
    * process restarts. */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      outputDir: String, trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery = {
    var cursor = bootstrapCursor(spark, outputDir)
    val stream = spark.readStream
      .schema(SpotSchema.apiSchema)
      .option("multiLine", value = true)
      .json(inputDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = processBatch(batch, cursor)
        out.persist()
        try {
          val stats = out.agg(count(lit(1)),
            min(col("Spotnum").cast("long")), max(col("Spotnum").cast("long"))).first()
          if (stats.getLong(0) > 0) { // F5: skip empty cycles
            // A2: cross-batch sequence gap against the previous batch's max
            // (wsprnet-scraper.sh:335-339 — logged, never re-fetched)
            val crossGap = stats.getLong(1) - cursor - 1
            if (cursor > 0 && crossGap > 1) {
              System.err.println(
                s"[ingest] batch $batchId: cross-batch gap of $crossGap spotnums after $cursor")
            }
            out.write.mode("append").parquet(outputDir)
            cursor = math.max(cursor, stats.getLong(2))
          }
        } finally out.unpersist()
        ()
      }
      .start()
  }

  /** Watermarked per-band spot-rate aggregation — the robust form of the
    * reference's per-cycle stats line (A5) under late/out-of-order arrivals
    * (the reference assumes in-order arrival, SURVEY.md §2 T7): tumbling
    * 2-minute windows (one WSPR cycle) with bounded lateness state. */
  def windowedSpotStats(spots: DataFrame, lateness: String = "10 minutes"): DataFrame =
    spots
      .withColumn("event_time", to_timestamp(from_unixtime(col("Date"))))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), "2 minutes"), col("Band"))
      .agg(count(lit(1)).as("n_spots"), avg(col("dB")).as("avg_snr"))
      .select(col("window.start").as("cycle_start"), col("Band"),
        col("n_spots"), col("avg_snr"))

  /** WSPR cycle alignment (T1): seconds to sleep until the next scrape offset
    * within the 120 s cycle (offsets 55/85/115, wsprnet-scraper.sh:344-376).
    * Exposed for a driver loop around Trigger.AvailableNow. */
  def secondsToNextOffset(epochNow: Long, offsets: Seq[Int] = Seq(55, 85, 115),
      cycleSeconds: Int = 120): Long = {
    val pos = epochNow % cycleSeconds
    val next = offsets.map(_.toLong).filter(_ > pos).minOption
      .getOrElse(offsets.head.toLong + cycleSeconds)
    next - pos
  }
}
