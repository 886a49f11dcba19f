package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.Windows
import graft.views.Views

/** Windowed-aggregation + incremental-view pack (SURVEY §2.9/§2.10)
  * over the events table. The window builders are mode-agnostic —
  * the same operators run under Structured Streaming (see
  * StreamingSpec for the readStream/foreachBatch forms); here they
  * run in batch so the DuckDB oracle can value-check the semantics.
  */
object StreamQueries {

  private def aggs = Windows.standardAggs(col("value"), col("user_id"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T6: daily tumbling windows per event type.
    "t6_tumbling" -> ((s, dir) => {
      Windows.tumbling(Tables.events(s, dir), "ts", "1 day",
        Seq("event_type"), aggs)
        .select("event_type", "window_start", "cnt", "sum_value", "avg_value",
          "min_value", "max_value", "distinct_users")
        .orderBy("event_type", "window_start")
    }),

    // T7: 2-day windows sliding by 1 day (each event in 2 windows —
    // real sliding semantics; the reference's slide is a no-op bug we
    // do NOT replicate).
    "t7_sliding" -> ((s, dir) => {
      Windows.sliding(Tables.events(s, dir), "ts", "2 days", "1 day",
        Seq("event_type"), aggs)
        .select("event_type", "window_start", "cnt", "sum_value", "avg_value",
          "min_value", "max_value", "distinct_users")
        .orderBy("event_type", "window_start")
    }),

    // T8: 8-hour-gap session windows per user.
    "t8_session" -> ((s, dir) => {
      Windows.session(Tables.events(s, dir), "ts", "8 hours",
        Seq("user_id"),
        Seq(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value")))
        .select("user_id", "session_start", "cnt", "sum_value")
        .orderBy("user_id", "session_start")
    }),

    // T9 (batch form): count windows of 5 events per user.
    "t9_count_window" -> ((s, dir) => {
      Windows.countWindowBatch(Tables.events(s, dir), "ts", "event_id",
        "user_id", 5,
        Seq(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value")))
        .select("user_id", "bucket", "cnt", "sum_value")
        .orderBy("user_id", "bucket")
    }),

    // T10: global (never-closing) running aggregate per event type.
    "t10_global_agg" -> ((s, dir) => {
      Windows.global(Tables.events(s, dir), Seq("event_type"), aggs)
        .orderBy("event_type")
    }),

    // V5: incremental view maintenance parity — bootstrap an agg view
    // from events before T1, apply an ADD batch (T1..T2) and a REMOVE
    // batch (retention deletion of user_id%10==0 rows from the
    // bootstrap span) through the delta-merge path, exact min/max
    // recompute for touched groups included. The oracle recomputes
    // the same final state directly — incremental == batch.
    "v5_incremental_view" -> ((s, dir) => {
      val t1 = lit(java.sql.Timestamp.valueOf("2024-01-11 00:00:00"))
      val t2 = lit(java.sql.Timestamp.valueOf("2024-01-21 00:00:00"))
      val ev = Tables.events(s, dir)
      val state0 = Views.initAggState(
        ev.filter(col("ts") < t1), Seq("event_type"))
      val adds = ev.filter(col("ts") >= t1 && col("ts") < t2)
        .select(lit("add").as("op"), col("event_type"), col("value"))
      val removes = ev.filter(col("ts") < t1 && col("user_id") % 10 === 0)
        .select(lit("remove").as("op"), col("event_type"), col("value"))
      val changes = adds.unionByName(removes)
      val finalBase = ev.filter(col("ts") < t2 &&
        !(col("ts") < t1 && col("user_id") % 10 === 0))
      val state1 = Views.mergeAggDelta(state0, changes, Seq("event_type"),
        base = Some(finalBase))
      Views.finalizeAgg(state1).orderBy("event_type")
    })
  )

  private val stdAggSql =
    """COUNT(*) AS cnt, ROUND(SUM(value), 4) AS sum_value,
       ROUND(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) / (COUNT(*) * 100.0)
         + 1e-9, 4) AS avg_value,
       ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value,
       COUNT(DISTINCT user_id) AS distinct_users"""

  val oracles: Map[String, String] = Map(
    "t6_tumbling" ->
      s"""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
                 $stdAggSql
          FROM events GROUP BY 1, 2 ORDER BY event_type, window_start""",
    "t7_sliding" ->
      s"""SELECT event_type,
                 date_trunc('day', ts) - off * INTERVAL 1 DAY AS window_start,
                 $stdAggSql
          FROM events CROSS JOIN (VALUES (0), (1)) AS k(off)
          GROUP BY 1, 2 ORDER BY event_type, window_start""",
    "t8_session" ->
      """WITH x AS (
           SELECT user_id, ts, value,
                  CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 8 HOUR
                       THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid FROM x)
         SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt,
                ROUND(SUM(value), 4) AS sum_value
         FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "t9_count_window" ->
      """WITH x AS (
           SELECT user_id, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS rn
           FROM events)
         SELECT user_id, (rn - 1) // 5 AS bucket, COUNT(*) AS cnt,
                ROUND(SUM(value), 4) AS sum_value
         FROM x GROUP BY user_id, bucket ORDER BY user_id, bucket""",
    "t10_global_agg" ->
      s"""SELECT event_type, $stdAggSql
          FROM events GROUP BY event_type ORDER BY event_type""",
    "v5_incremental_view" ->
      """SELECT event_type, COUNT(*) AS cnt,
                ROUND(SUM(value), 4) AS sum,
                ROUND(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) / (COUNT(*) * 100.0) + 1e-9, 4) AS avg,
                ROUND(MIN(value), 4) AS min,
                ROUND(MAX(value), 4) AS max
         FROM events
         WHERE ts < TIMESTAMP '2024-01-21 00:00:00'
           AND NOT (ts < TIMESTAMP '2024-01-11 00:00:00' AND user_id % 10 = 0)
         GROUP BY event_type ORDER BY event_type"""
  )
}
