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
  /** `total` accumulates per-event values rounded to 2 decimals as exact
    * decimals (order-independent addition), matching the batch form's
    * sum(cast(value as decimal(18,2))).
    *
    * State-schema note: adding this field changed the streaming state
    * encoding — a query restarted from a checkpoint written by the previous
    * (start,last,n) shape fails Spark's state-store schema check and needs a
    * fresh checkpoint (sessions are reconstructible by re-running the batch
    * form over the closed input). */
  case class SessionState(start: Long, last: Long, n: Long, total: BigDecimal)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)

  /** Streaming: session rows are emitted once closed — and a session closes
    * ONLY when the watermark passes its gap, never eagerly on a later event:
    * within the watermark's lateness bound an out-of-order event may still
    * extend a session backward or bridge two sessions, so the state is the
    * full list of open sessions and inserts merge by interval
    * ([start-gap, last+gap]), coalescing neighbors an event bridges.
    * Input must carry an `event_time` column with a watermark at least as
    * large as the gap; results then match the batch [[sessions]] over the
    * same closed input even under reordering within the lateness bound. */
  def sessionsStreaming(spark: SparkSession, events: Dataset[Ev],
      gapSeconds: Long): Dataset[SessionOut] = {
    import spark.implicits._

    def insert(open: List[SessionState], ts: Long, value: Double): List[SessionState] = {
      val (touching, rest) = open.partition(s =>
        ts >= s.start - gapSeconds && ts <= s.last + gapSeconds)
      val v = BigDecimal(value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val merged = touching.foldLeft(SessionState(ts, ts, 1, v)) { (acc, s) =>
        SessionState(math.min(acc.start, s.start), math.max(acc.last, s.last),
          acc.n + s.n, acc.total + s.total)
      }
      (merged :: rest).sortBy(_.start)
    }

    def closeRipe(open: List[SessionState], watermarkMs: Long):
        (List[SessionState], List[SessionState]) =
      open.partition(s => (s.last + gapSeconds) * 1000L < watermarkMs)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          val wm = state.getCurrentWatermarkMs()
          val open0 = state.getOption.getOrElse(Nil)
          val open1 =
            if (state.hasTimedOut) open0
            else batch.foldLeft(open0)((acc, e) => insert(acc, e.ts_sec, e.value))
          val (ripe, stillOpen) = closeRipe(open1, wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(stillOpen)
            state.setTimeoutTimestamp(
              (stillOpen.map(_.last).min + gapSeconds) * 1000L + 1000L)
          }
          ripe.sortBy(_.start).iterator.map(s =>
            SessionOut(userId, s.start, s.last, s.n, s.total.toDouble))
      }
  }
}
