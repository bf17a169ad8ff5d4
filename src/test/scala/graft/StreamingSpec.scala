package graft

import graft.streaming.Ingest
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Path}

class StreamingSpec extends SparkSpec {

  private def spotJson(ids: Seq[Long]): String =
    ids.map { i =>
      s"""{"Spotnum": $i, "Date": ${1614159000L + i * 60}, "Reporter": "R$i",
         |"ReporterGrid": "FN12gx", "dB": -21, "MHz": 7.040172, "CallSign": "T$i",
         |"Grid": "DN70", "Power": 23, "Drift": 0, "distance": 1, "azimuth": 1,
         |"Band": 7, "version": "2.3.0", "code": 1}""".stripMargin.replace("\n", " ")
    }.mkString("[", ",\n", "]")

  test("file-drop ingest: cursor dedup within and across restarts (S2/F1/T7)") {
    val in = Files.createTempDirectory("stream-in").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val out = Files.createTempDirectory("stream-out").toString + "/sink"

    // wave 1: spots 1..10 with an in-batch duplicate
    Files.writeString(Path.of(in, "b1.json"), spotJson((1L to 10L) :+ 5L))
    val q1 = Ingest.start(spark, in, ckpt, out, Trigger.AvailableNow())
    q1.awaitTermination()
    val after1 = Ingest.readSink(spark, out)
    assert(after1.count() == 10)
    assert(after1.columns.length == 27)

    // wave 2: overlapping batch 5..15 — only 11..15 are new
    Files.writeString(Path.of(in, "b2.json"), spotJson(5L to 15L))
    val q2 = Ingest.start(spark, in, ckpt, out, Trigger.AvailableNow())
    q2.awaitTermination()
    val after2 = Ingest.readSink(spark, out)
    assert(after2.count() == 15, "restart must not reprocess checkpointed files, cursor drops overlap")
    assert(after2.select("Spotnum").collect().map(_.getLong(0)).sorted.toSeq == (1L to 15L))

    // wave 3: empty batch (F5) — no new rows, no failure
    Files.writeString(Path.of(in, "b3.json"), "[]")
    val q3 = Ingest.start(spark, in, ckpt, out, Trigger.AvailableNow())
    q3.awaitTermination()
    assert(Ingest.readSink(spark, out).count() == 15)
  }

  test("checkpointed cursor: crash replays reconverge, no sink-max reliance (S3/T7)") {
    import graft.spots.SpotSchema
    def mkBatch(ids: Seq[Long]) = {
      val f = Files.createTempFile("batch", ".json")
      Files.writeString(f, spotJson(ids))
      spark.read.schema(SpotSchema.apiSchema).option("multiLine", value = true)
        .json(f.toString)
    }
    val ckpt = Files.createTempDirectory("cursor-ckpt").toString
    val out = Files.createTempDirectory("cursor-out").toString + "/sink"

    // batch 0 commits; cursor state records before=0, after=10
    assert(Ingest.commitBatch(spark, mkBatch(1L to 10L), 0, out, ckpt) == 10L)
    assert(Ingest.readCursor(ckpt).contains(Ingest.CursorState(0, 0, 10)))
    assert(Ingest.readSink(spark, out).count() == 10)

    // crash between sink write and source commit => same batch id replays:
    // the overwrite into batch-0 and the `before` cursor reconverge the sink
    assert(Ingest.commitBatch(spark, mkBatch(1L to 10L), 0, out, ckpt) == 10L)
    assert(Ingest.readSink(spark, out).count() == 10, "replay must not append duplicates")

    // prove the cursor comes from the checkpoint, NOT from max(sink): empty
    // the sink, then commit an overlapping batch — 5..10 must still be
    // filtered even though the sink no longer knows about them
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(out))
    assert(Ingest.commitBatch(spark, mkBatch(5L to 15L), 1, out, ckpt) == 15L)
    val ids = Ingest.readSink(spark, out).select("Spotnum")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (11L to 15L), s"cursor must persist independently of the sink: $ids")

    // an empty batch advances the state file but not the cursor value
    assert(Ingest.commitBatch(spark, mkBatch(Nil), 2, out, ckpt) == 15L)
    assert(Ingest.readCursor(ckpt).contains(Ingest.CursorState(2, 15, 15)))

    // checkpoint reset with the sink kept: recycled batch ids would overwrite
    // committed batch-N data — the commit must refuse, not destroy
    val ckpt2 = Files.createTempDirectory("cursor-ckpt2").toString
    val e = intercept[IllegalArgumentException] {
      Ingest.commitBatch(spark, mkBatch(16L to 20L), 0, out, ckpt2)
    }
    assert(e.getMessage.contains("refusing"))

    // a corrupt cursor file falls back to the bootstrap path, not an exception
    Files.writeString(Path.of(ckpt, "graft-cursor"), "a,b,c")
    assert(Ingest.readCursor(ckpt).isEmpty)
  }

  test("cursor bootstrap from sink (S3): cold start = 0, warm = max Spotnum") {
    assert(Ingest.bootstrapCursor(spark, "/nonexistent/dir") == 0L)
    val dir = Files.createTempDirectory("boot").toString + "/p"
    import spark.implicits._
    Seq((7L, "x"), (3L, "y")).toDF("Spotnum", "v").write.parquet(dir)
    assert(Ingest.bootstrapCursor(spark, dir) == 7L)
  }

  test("watermarked windowed stats emit finalized cycles, drop too-late rows (T7)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Long, Int, Int)] // (Spotnum, Date, Band, dB)
    val spots = source.toDF().toDF("Spotnum", "Date", "Band", "dB")
    val q = Ingest.windowedSpotStats(spots, "4 minutes")
      .writeStream.format("memory").queryName("cycles").outputMode(OutputMode.Append).start()
    val t0 = 1614159000L - 1614159000L % 120 // cycle-aligned
    // cycle 1 rows + a slightly-late row, then advance far beyond the watermark
    source.addData((1L, t0 + 10, 7, -20), (2L, t0 + 60, 7, -10), (3L, t0 + 130, 14, -5))
    q.processAllAvailable()
    source.addData((4L, t0 + 3600, 7, -1)) // advances watermark, finalizes old windows
    q.processAllAvailable()
    source.addData((5L, t0 + 20, 7, -30))  // too late: beyond watermark, dropped
    q.processAllAvailable()
    val rows = spark.table("cycles").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.contains((t0, 7, 2L, -15.0)), s"got ${rows.toSeq}")
    assert(rows.contains((t0 + 120, 14, 1L, -5.0)))
    assert(!rows.exists(r => r._1 == t0 && r._3 == 3L), "late row must not reopen the window")
    q.stop()
  }

  test("streaming dedup with bounded state (dropDuplicatesWithinWatermark)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{from_unixtime, to_timestamp}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Long)] // (Spotnum, Date)
    val deduped = source.toDF().toDF("Spotnum", "Date")
      .withColumn("event_time", to_timestamp(from_unixtime($"Date")))
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("Spotnum")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    source.addData((1L, 1000L), (2L, 1060L), (1L, 1000L)) // in-batch dup
    q.processAllAvailable()
    source.addData((2L, 1060L), (3L, 1120L))              // cross-batch replay
    q.processAllAvailable()
    val ids = spark.table("dedup_stream").select("Spotnum")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"replays must be dropped while state is live: $ids")
    q.stop()
  }

  test("cycle-offset alignment (T1)") {
    assert(Ingest.secondsToNextOffset(0) == 55)
    assert(Ingest.secondsToNextOffset(60) == 25)
    assert(Ingest.secondsToNextOffset(90) == 25)
    assert(Ingest.secondsToNextOffset(116) == 59) // wrap to next cycle's 55
    assert(Ingest.secondsToNextOffset(55) == 30)  // at an offset -> next one
  }
}
