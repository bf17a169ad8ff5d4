package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization of an event stream by inactivity gap — a standard
  * training-data-pipeline operator (user/doc interaction grouping).
  *
  * Batch form: per-key window (lag -> new-session flag -> running sum as
  * session index) — parallel across keys, no global sort, SQL-expressible
  * (oracle-checked as q23). Streaming form: explicit session state per key
  * via flatMapGroupsWithState with event-time timeout — emits a session only
  * when the watermark passes its gap, so results are identical to the batch
  * form over the same closed input.
  */
object Sessionize {

  /** Batch: events(user_id, ts_sec, value) -> one row per session. */
  def sessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_sec")
    val flagged = events
      .withColumn("prev_ts", lag("ts_sec", 1).over(w))
      .withColumn("new_session",
        (col("prev_ts").isNull || (col("ts_sec") - col("prev_ts") > gapSeconds)).cast("long"))
      .withColumn("session_idx", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "session_idx")
      .agg(min("ts_sec").as("session_start"), max("ts_sec").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .drop("session_idx")
  }

  case class Ev(user_id: Long, ts_sec: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  /** Streaming: session rows are emitted once closed (gap elapsed in event
    * time). Input must carry an `event_time` timestamp column with a
    * watermark at least as large as the gap. */
  def sessionsStreaming(spark: SparkSession, events: Dataset[Ev],
      gapSeconds: Long): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // watermark passed: every open session is closed by definition
            val out = state.getOption.getOrElse(Nil).map(s =>
              SessionOut(userId, s.start, s.last, s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts_sec)
            var open = state.getOption.getOrElse(Nil).sortBy(_.start)
            var closed = List.empty[SessionState]
            sorted.foreach { e =>
              open match {
                case cur :: rest if e.ts_sec - cur.last <= gapSeconds =>
                  open = cur.copy(last = math.max(cur.last, e.ts_sec), n = cur.n + 1) :: rest
                case cur :: rest =>
                  closed = cur :: closed
                  open = SessionState(e.ts_sec, e.ts_sec, 1) :: rest
                case Nil =>
                  open = List(SessionState(e.ts_sec, e.ts_sec, 1))
              }
            }
            state.update(open)
            // keep state alive until the open session's gap can elapse
            open.headOption.foreach { s =>
              state.setTimeoutTimestamp((s.last + gapSeconds) * 1000L + 1000L)
            }
            closed.reverseIterator.map(s => SessionOut(userId, s.start, s.last, s.n))
          }
      }
  }
}
