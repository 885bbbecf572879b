package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QHelpers._

/** SURVEY.md §2b rows 54–55: batch time-window semantics over `events`.
  * The streaming variants (Structured Streaming window()/session_window()
  * with watermarks) live in graft.streaming; these batch forms are the
  * DuckDB-oracle-checkable equivalents.
  */
object TimeOps {

  val defs: Map[String, Q] = Map(
    // 54. tumbling 1-hour window aggregation — uses Spark's window()
    // grouping (same operator the streaming path uses); hour-aligned so
    // the oracle can express it as date_trunc.
    "time_tumbling_agg" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("hour_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("hour_start"), col("event_type"))),

    // 55. sessionization via gaps-and-islands: 30-min inactivity gap →
    // new session; per-session aggregates. All-window-function pipeline —
    // shuffles once on user_id, then both windows reuse the partitioning.
    "time_sessionize_gaps" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      // Gap compared in exact integer microseconds on both engines
      // (unix_micros here, epoch_us in DuckDB) — no float/truncation drift.
      val newSession = when(
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
          > 1800L * 1000000L, 1L).otherwise(lit(0L))
      val withFlag = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          newSession.as("is_new"))
      val sessionized = withFlag.select(col("user_id"), col("event_id"),
        col("ts"), col("value"),
        sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_id"))
      sessionized
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          dsum(col("value")).as("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "time_tumbling_agg" ->
      s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |       COUNT(*) AS n, ${sqlDsum("value")} AS total_value
         |FROM events
         |GROUP BY date_trunc('hour', ts), event_type
         |ORDER BY hour_start, event_type""".stripMargin,

    "time_sessionize_gaps" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         |), sessions AS (
         |  SELECT user_id, event_id, ts, value,
         |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged
         |)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |       MIN(ts) AS session_start, MAX(ts) AS session_end,
         |       ${sqlDsum("value")} AS session_value
         |FROM sessions
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin
  )
}
