package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream (SURVEY.md §1
  * "Streams" extension path; the reference itself has no streaming — it
  * blocks writes and delegates batch SQL — so this is the engine
  * extension a Spark-native deployment gets for free).
  *
  * The batch equivalents (`time_tumbling_agg`, `time_sessionize_gaps`,
  * SURVEY §2b rows 54-55) are the DuckDB-oracle-checked semantics;
  * StreamsSpec asserts the streaming results CONVERGE to the batch
  * answers on the same rows — watermarks + incremental state must not
  * change the math.
  *
  * 100 TB posture: all state is keyed and bounded — tumbling windows
  * expire by watermark, sessions time out by event-time gap; no
  * unbounded driver or executor state.
  */
object Streams {

  /** Event row shape of the testdata `events` table. */
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Closed session summary emitted by [[sessionizeWithState]]. */
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, session_value: Double)

  /** Open-session state carried between micro-batches (public: the
    * product encoder's generated code must reach the constructor). */
  final case class SessionState(start: Timestamp, last: Timestamp,
      nEvents: Long, total: Double)

  /** Streaming tumbling 1-hour aggregation — the same
    * window()/count/sum plan the batch query uses, plus a watermark so
    * state expires (late rows beyond `watermark` are dropped). */
  def tumblingAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Session windows via the built-in session_window (30-min gap) —
    * Spark merges overlapping per-event windows; watermark closes them. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup — the streaming face of Dedup.exact: the
    * first arrival per key is kept, later duplicates are dropped, and
    * dropDuplicatesWithinWatermark bounds the key state to the
    * watermark horizon (a plain dropDuplicates would grow state
    * forever on an unbounded stream — the classic streaming-dedup
    * failure at scale). Exactly-once per key holds for duplicates
    * arriving within the watermark of the first occurrence — the
    * guarantee an at-least-once ingest pipeline needs. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Custom sessionization with explicit keyed state
    * (flatMapGroupsWithState): per-user open-session state, event-time
    * timeout at `gapSeconds` past the watermark, emitting one closed
    * [[Session]] per quiet period. The state machine mirrors the batch
    * gaps-and-islands query's session boundaries. */
  def sessionizeWithState(events: Dataset[Event],
      gapSeconds: Long = 1800L): Dataset[Session] = {
    import events.sparkSession.implicits._

    def fold(st: Option[SessionState], evs: Seq[Event]): (Seq[Session], Option[SessionState]) = {
      var state = st
      val closed = Seq.newBuilder[Session]
      evs.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        state match {
          case Some(s) if e.ts.getTime - s.last.getTime <= gapSeconds * 1000L =>
            state = Some(s.copy(last = e.ts, nEvents = s.nEvents + 1, total = s.total + e.value))
          case Some(s) =>
            closed += Session(e.user_id, s.start, s.last, s.nEvents, s.total)
            state = Some(SessionState(e.ts, e.ts, 1L, e.value))
          case None =>
            state = Some(SessionState(e.ts, e.ts, 1L, e.value))
        }
      }
      (closed.result(), state)
    }

    events.withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.last, s.nEvents, s.total))
          } else {
            val (closed, next) = fold(state.getOption, rows.toSeq)
            next.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapSeconds * 1000L)
            }
            closed.iterator
          }
      }
  }
}
