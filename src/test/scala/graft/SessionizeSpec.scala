package graft

import graft.operators.Sessionize
import graft.operators.Sessionize.{Ev, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 100L
  // user 1: [1000,1050,1120] (one session, gaps 50,70<=100), then 1400 (new
  // session); user 2: single event. ts starts at 1000: the streaming
  // late-row filter drops rows at or before the initial watermark (0)
  private val batchEvents = Seq(
    (1L, 1000L, 1.0), (1L, 1050L, 2.0), (1L, 1120L, 3.0), (1L, 1400L, 4.0),
    (2L, 1010L, 5.0))

  test("batch sessionization: gap splitting, per-session aggregates") {
    val got = Sessionize.sessions(
      batchEvents.toDF("user_id", "ts_sec", "value"), gap)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 1000L, 1120L, 3L, 6.0),
      (1L, 1400L, 1400L, 1L, 4.0),
      (2L, 1010L, 1010L, 1L, 5.0)))
  }

  test("streaming sessionization closes sessions as the watermark advances") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Ev]
    val withTime = source.toDS()
      .withColumn("event_time", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.from_unixtime($"ts_sec")))
      .withWatermark("event_time", "0 seconds")
      .as[Ev]
    val q = Sessionize.sessionsStreaming(spark, withTime, gap)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()

    source.addData(Ev(1, 1000, 1.0), Ev(1, 1050, 2.0), Ev(2, 1010, 5.0))
    q.processAllAvailable()
    source.addData(Ev(1, 1120, 3.0))      // extends user 1's open session
    q.processAllAvailable()
    source.addData(Ev(1, 1400, 4.0))      // gap > 100 closes [1000,1120] immediately
    q.processAllAvailable()
    source.addData(Ev(3, 5000, 0.0))      // watermark -> 5000: times out all opens
    q.processAllAvailable()
    source.addData(Ev(3, 9000, 0.0))      // advance again so user 3's own session closes
    q.processAllAvailable()

    val got = spark.table("sessions").as[SessionOut].collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet
    assert(got.contains((1L, 1000L, 1120L, 3L, 6.0)), s"got $got")
    assert(got.contains((1L, 1400L, 1400L, 1L, 4.0)))
    assert(got.contains((2L, 1010L, 1010L, 1L, 5.0)))
    q.stop()
    // streaming results agree with batch over the same closed input on EVERY
    // emitted field, including the decimal-summed total_value
    val batch = Sessionize.sessions(
      (batchEvents :+ ((3L, 5000L, 0.0))).toDF("user_id", "ts_sec", "value"), gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got.filter(_._1 != 3L).subsetOf(batch))
  }
}
