package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryUtil._
import graft.streaming.Windows

/** Event-time windowing inventory (SURVEY.md §2.4), oracle-tested in batch:
  * window assignment is the same expression in batch and streaming, so the
  * DuckDB oracle validates the streaming semantics cheaply (SURVEY §7
  * Phase 3a). Streaming execution of the same windows is covered by
  * StreamingSpec with MemoryStream.
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(

    // FixedWindows: hourly tumbling counts + sums over events.
    "q_fixed_window" -> { (s, dir) =>
      Tables(s, dir).events
        .groupBy(Windows.fixed(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy(col("w_start"))
    },

    // SlidingWindows: 1h windows every 30m — each event in exactly 2.
    "q_sliding_window" -> { (s, dir) =>
      Tables(s, dir).events
        .groupBy(Windows.sliding(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("n"))
        .orderBy(col("w_start"))
    },

    // Sessions: 15-minute-gap merging windows per user.
    "q_session_window" -> { (s, dir) =>
      Tables(s, dir).events
        .groupBy(col("user_id"), Windows.sessions(col("ts"), "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(
          col("user_id"),
          date_trunc("second", col("w.start")).as("session_start"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // CalendarWindows.months over orders.
    "q_calendar_window" -> { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(Windows.calendar(col("o_orderdate"), "month").as("month"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("month"))
    },

    // GlobalWindows: single window covering all time — plain global agg.
    "q_global_window" -> { (s, dir) =>
      Tables(s, dir).events.agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q_fixed_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY w_start ORDER BY w_start""",
    "q_sliding_window" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts) - k.k * INTERVAL '30 minutes' AS w_start,
           count(*) AS n
         FROM events, (SELECT unnest([0, 1]) AS k) k
         GROUP BY w_start ORDER BY w_start""",
    "q_session_window" ->
      """WITH flagged AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '15 minutes'
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           FROM flagged)
         SELECT user_id, date_trunc('second', min(ts)) AS session_start,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q_calendar_window" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY month ORDER BY month""",
    "q_global_window" ->
      """SELECT count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           count(DISTINCT user_id) AS n_users
         FROM events""",
  )
}
