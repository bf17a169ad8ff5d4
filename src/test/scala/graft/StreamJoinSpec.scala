package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamJoinSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def ts(sec: Long) = to_timestamp(from_unixtime(lit(sec)))

  test("interval join matches the batch join over the closed input") {
    val t0 = 1700000000L
    // (reporter, sec, spotnum) left; (reporter, sec, status) right
    val leftRows = Seq(("R1", t0 + 10, 1L), ("R1", t0 + 300, 2L),
      ("R2", t0 + 50, 3L), ("R3", t0 + 80, 4L))
    val rightRows = Seq(("R1", t0 + 40, "ok"), ("R1", t0 + 500, "warn"),
      ("R2", t0 + 45, "ok"), ("R2", t0 + 400, "late"))

    val lSrc = MemoryStream[(String, Long, Long)]
    val rSrc = MemoryStream[(String, Long, String)]
    val l = lSrc.toDF().toDF("reporter", "sec", "spotnum")
      .withColumn("l_time", to_timestamp(from_unixtime(col("sec")))).drop("sec")
    val r = rSrc.toDF().toDF("reporter", "sec", "status")
      .withColumn("r_time", to_timestamp(from_unixtime(col("sec")))).drop("sec")

    // match right events within [-60s, +60s] of the left event
    val joined = StreamJoin.intervalJoin(l, r, "reporter", "l_time", "r_time",
      -60, 60, watermarkSec = 120)
      .select(col("l.spotnum"), col("r.status"))
    val q = joined.writeStream.format("memory").queryName("sj")
      .outputMode(OutputMode.Append).start()
    lSrc.addData(leftRows: _*)
    rSrc.addData(rightRows: _*)
    q.processAllAvailable()
    // advance both watermarks far so every joinable pair is emitted
    lSrc.addData(("RX", t0 + 10000, 99L))
    rSrc.addData(("RX", t0 + 10000, "zz"))
    q.processAllAvailable()
    val got = spark.table("sj").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    // batch reference over the same closed input
    val bl = leftRows.toDF("reporter", "sec", "spotnum")
    val br = rightRows.toDF("reporter", "sec2", "status")
    val want = bl.join(br, Seq("reporter"))
      .filter(col("sec2") >= col("sec") - 60 && col("sec2") <= col("sec") + 60)
      .select(col("spotnum"), col("status"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((99L, "zz")))
    assert(got - ((99L, "zz")) == want, s"stream $got vs batch $want")
    // R1's t0+300 spot must NOT see the t0+500 status (outside +60s)
    assert(!got.contains((2L, "warn")))
    q.stop()
  }

  test("state is evicted: a right row later than watermark+bound never matches") {
    val t0 = 1700000000L
    val lSrc = MemoryStream[(String, Long, Long)]
    val rSrc = MemoryStream[(String, Long, String)]
    val l = lSrc.toDF().toDF("k", "sec", "id")
      .withColumn("lt", to_timestamp(from_unixtime(col("sec")))).drop("sec")
    val r = rSrc.toDF().toDF("k", "sec", "v")
      .withColumn("rt", to_timestamp(from_unixtime(col("sec")))).drop("sec")
    val joined = StreamJoin.intervalJoin(l, r, "k", "lt", "rt", -30, 30, 60)
      .select(col("l.id"), col("r.v"))
    val q = joined.writeStream.format("memory").queryName("sj2")
      .outputMode(OutputMode.Append).start()
    lSrc.addData(("a", t0, 1L))
    rSrc.addData(("zz", t0, "seed"))
    q.processAllAvailable()
    // push both watermarks way past t0 + bound + watermark
    lSrc.addData(("b", t0 + 5000, 2L))
    rSrc.addData(("zz", t0 + 5000, "advance"))
    q.processAllAvailable()
    // a matching right row arrives far too late — state for id=1 is gone
    rSrc.addData(("a", t0 + 10, "too_late"))
    q.processAllAvailable()
    val got = spark.table("sj2").collect().map(_.getLong(0)).toSet
    assert(!got.contains(1L), s"late row must not match evicted state: $got")
    q.stop()
  }
}
