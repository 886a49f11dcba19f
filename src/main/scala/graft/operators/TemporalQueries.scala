package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Temporal-join query pack over the events table: event attribution
  * (as-of) and temporal co-occurrence (interval join) — the two join
  * shapes event pipelines need that plain equi-joins can't express.
  */
object TemporalQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of attribution: each purchase is attributed to the same
    // user's most recent click at or before it (null when the user
    // never clicked before buying). Backward as-of via union+window —
    // one shuffle on user_id, no inequality join.
    "asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      // unique (user_id, ts) on the right: deterministic max-id survivor
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("click_id"),
          max_by(col("value"), col("event_id")).as("click_value"))
      TemporalJoins.asOfJoin(purchases, clicks,
          "user_id", "ts", "user_id", "ts", Seq("click_id", "click_value"))
        .select(col("event_id"), col("click_id"),
          round(col("click_value"), 4).as("click_value"))
        .orderBy("event_id")
    }),

    // Temporal co-occurrence: for each error event, how many other
    // events (any user) happened within ±60 s. Keyless interval join
    // via time-bucket binning — an equi-join on the bucket id, never
    // the O(|L|·|R|) nested loop a raw BETWEEN condition plans as.
    "range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"))
      val others = ev.select(col("event_id").as("other_id"),
        col("ts").as("other_ts"))
      val pairs = TemporalJoins.rangeJoinBinned(
          errors, "ts", others, "other_ts",
          loSeconds = -60, hiSeconds = 60, bucketSeconds = 120)
        .filter(col("other_id") =!= col("event_id"))
      val counts = pairs.groupBy("event_id").agg(count(lit(1)).as("n_near"))
      errors.select("event_id").join(counts, Seq("event_id"), "left")
        .select(col("event_id"), coalesce(col("n_near"), lit(0L)).as("n_near"))
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
           r AS (SELECT user_id, ts, max(event_id) AS click_id,
                        arg_max(value, event_id) AS click_value
                 FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT l.event_id, r.click_id, ROUND(r.click_value, 4) AS click_value
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND r.ts <= l.ts
         ORDER BY event_id""",
    "range_join" ->
      """WITH e AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
         SELECT e.event_id, count(o.event_id) AS n_near
         FROM e LEFT JOIN (SELECT event_id, ts FROM events) o
           ON o.ts BETWEEN e.ts - INTERVAL 60 SECOND
                       AND e.ts + INTERVAL 60 SECOND
          AND o.event_id <> e.event_id
         GROUP BY 1 ORDER BY 1"""
  )
}
