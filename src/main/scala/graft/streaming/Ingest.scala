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
  * refetching processed batches, and the cross-batch cursor itself is
  * persisted in the checkpoint directory (graft-cursor, [[Ingest.commitBatch]])
  * with per-batch idempotent sink writes, so replays after a crash
  * reconverge without consulting the sink.
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
    * abort (:223-226). Used only when no checkpointed cursor exists (cold
    * start or a legacy sink written before cursor checkpointing). */
  def bootstrapCursor(spark: SparkSession, sinkParquetDir: String): Long = {
    // cold start = no COMMITTED data; a crashed write leaves only
    // _temporary/_SUCCESS debris (possibly nested in a batch-N subdirectory),
    // which must still count as cold
    def hasData(f: java.io.File): Boolean =
      if (!f.exists()) false
      else if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
          .exists(hasData)
      else true
    if (!hasData(new java.io.File(sinkParquetDir))) 0L
    else {
      // an EXISTING non-empty sink that fails to read must abort, not silently
      // restart from 0 — cursor 0 re-ingests the whole history as duplicates
      readSink(spark, sinkParquetDir)
        .agg(max(col("Spotnum").cast("long"))).first() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
    }
  }

  /** Read the ingest sink (flat legacy layout or the per-batch subdirectory
    * layout [[commitBatch]] writes). */
  def readSink(spark: SparkSession, outputDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(outputDir)

  /** Cursor state persisted next to the stream checkpoint: the last batch
    * that ran and the cursor value before and after it. `before` exists so a
    * REPLAY of that same batch (crash between sink write and source commit)
    * filters with the same cursor the first attempt used. */
  private[graft] case class CursorState(batchId: Long, before: Long, after: Long)

  private def cursorPath(checkpointDir: String) =
    java.nio.file.Path.of(checkpointDir, "graft-cursor")

  private[graft] def readCursor(checkpointDir: String): Option[CursorState] = {
    val p = cursorPath(checkpointDir)
    // unreadable/corrupt state falls back to the sink-max bootstrap (None);
    // the read race (file deleted between exists and read) likewise
    if (!java.nio.file.Files.exists(p)) None
    else {
      val content =
        try java.nio.file.Files.readString(p).trim
        catch { case _: java.io.IOException => return None }
      content.split(",") match {
        case Array(b, before, after) =>
          for {
            bi <- b.toLongOption
            bef <- before.toLongOption
            aft <- after.toLongOption
          } yield CursorState(bi, bef, aft)
        case _ => None
      }
    }
  }

  private[graft] def writeCursor(checkpointDir: String, st: CursorState): Unit = {
    java.nio.file.Files.createDirectories(cursorPath(checkpointDir).getParent)
    val tmp = cursorPath(checkpointDir).resolveSibling("graft-cursor.tmp")
    java.nio.file.Files.writeString(tmp, s"${st.batchId},${st.before},${st.after}")
    java.nio.file.Files.move(tmp, cursorPath(checkpointDir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Commit one micro-batch idempotently (the reference's
    * WSPRNET_LAST_SPOTNUM cursor file, wsprnet-scraper.sh:341, made
    * crash-safe): the batch writes to its own `batch-<id>` subdirectory with
    * overwrite semantics, and the cursor advances through an atomically
    * renamed state file in the checkpoint directory. A crash at ANY point —
    * before, during, or after the sink write — replays the batch into the
    * same subdirectory with the same `before` cursor, reconverging to
    * identical sink contents instead of appending duplicates, and without
    * consulting the sink's max Spotnum. Returns the cursor after the batch. */
  def commitBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      outputDir: String, checkpointDir: String): Long = {
    val cursor = readCursor(checkpointDir) match {
      case Some(s) if s.batchId == batchId => s.before // replay of an in-flight batch
      case Some(s) => s.after
      case None =>
        // Cold start. A sink that already holds batch-N subdirectories with
        // NO cursor state means the checkpoint was reset while the sink was
        // kept — the new stream's batch ids restart at 0 and the overwrite
        // below would silently destroy the old batch-0. Refuse loudly; the
        // operator must restore the checkpoint or move the old sink aside.
        val stale = Option(new java.io.File(outputDir).listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
        require(stale.isEmpty,
          s"$outputDir contains ${stale.length} batch-* directories but $checkpointDir has no " +
            "cursor state: refusing to overwrite an existing sink with recycled batch ids")
        bootstrapCursor(spark, outputDir) // legacy flat sink or truly cold
    }
    val out = processBatch(batch, cursor)
    out.persist()
    try {
      val stats = out.agg(count(lit(1)),
        min(col("Spotnum").cast("long")), max(col("Spotnum").cast("long"))).first()
      val newCursor =
        if (stats.getLong(0) > 0) { // F5: skip empty cycles
          // A2: cross-batch sequence gap against the previous batch's max
          // (wsprnet-scraper.sh:335-339 — logged, never re-fetched). The
          // reference logs only when first - last > 2, i.e. at least TWO
          // missing ids — a one-id skip between scrapes is normal noise.
          val crossGap = stats.getLong(1) - cursor - 1
          if (cursor > 0 && crossGap >= 2) {
            System.err.println(
              s"[ingest] batch $batchId: cross-batch gap of $crossGap spotnums after $cursor")
          }
          out.write.mode("overwrite").parquet(s"$outputDir/batch-$batchId")
          math.max(cursor, stats.getLong(2))
        } else cursor
      writeCursor(checkpointDir, CursorState(batchId, cursor, newCursor))
      newCursor
    } finally out.unpersist()
  }

  /** Start the streaming ingest: JSON file-drop -> enrich -> parquet.
    * The cross-batch cursor is checkpointed ([[commitBatch]]): restarts
    * resume from the persisted cursor state, replays reconverge, and
    * duplicates in re-dropped files are filtered across process restarts. */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      outputDir: String, trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery = {
    val stream = spark.readStream
      .schema(SpotSchema.apiSchema)
      .option("multiLine", value = true)
      .json(inputDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(spark, batch, batchId, outputDir, checkpointDir)
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
