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
    val after1 = spark.read.parquet(out)
    assert(after1.count() == 10)
    assert(after1.columns.length == 27)

    // wave 2: overlapping batch 5..15 — only 11..15 are new
    Files.writeString(Path.of(in, "b2.json"), spotJson(5L to 15L))
    val q2 = Ingest.start(spark, in, ckpt, out, Trigger.AvailableNow())
    q2.awaitTermination()
    val after2 = spark.read.parquet(out)
    assert(after2.count() == 15, "restart must not reprocess checkpointed files, cursor drops overlap")
    assert(after2.select("Spotnum").collect().map(_.getLong(0)).sorted.toSeq == (1L to 15L))

    // wave 3: empty batch (F5) — no new rows, no failure
    Files.writeString(Path.of(in, "b3.json"), "[]")
    val q3 = Ingest.start(spark, in, ckpt, out, Trigger.AvailableNow())
    q3.awaitTermination()
    assert(spark.read.parquet(out).count() == 15)
  }

  test("cursor bootstrap from sink (S3): cold start = 0, warm = max Spotnum") {
    assert(Ingest.bootstrapCursor(spark, "/nonexistent/dir") == 0L)
    val dir = Files.createTempDirectory("boot").toString + "/p"
    import spark.implicits._
    Seq((7L, "x"), (3L, "y")).toDF("Spotnum", "v").write.parquet(dir)
    assert(Ingest.bootstrapCursor(spark, dir) == 7L)
  }

  test("cycle-offset alignment (T1)") {
    assert(Ingest.secondsToNextOffset(0) == 55)
    assert(Ingest.secondsToNextOffset(60) == 25)
    assert(Ingest.secondsToNextOffset(90) == 25)
    assert(Ingest.secondsToNextOffset(116) == 59) // wrap to next cycle's 55
    assert(Ingest.secondsToNextOffset(55) == 30)  // at an offset -> next one
  }
}
