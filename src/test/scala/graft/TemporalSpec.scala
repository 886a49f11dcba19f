package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{TemporalJoins, TemporalQueries}
import graft.sources.Tables

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")), // after r2 → matches r2
    (2L, 10L, ts("2024-01-01 10:05:00")), // tie with r3 → tie matches (<=)
    (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row → null
    (4L, 20L, ts("2024-01-01 12:00:00")), // key with no right rows → null
    (5L, 30L, ts("2024-01-01 12:00:00"))  // single right row before
  ).toDF("lid", "k", "t")

  private lazy val right = Seq(
    (101L, 10L, ts("2024-01-01 09:30:00"), 1.0),
    (102L, 10L, ts("2024-01-01 09:45:00"), 2.0), // r2
    (103L, 10L, ts("2024-01-01 10:05:00"), 3.0), // r3 (tie with l2)
    (104L, 10L, ts("2024-01-01 11:00:00"), 4.0), // after every left
    (105L, 30L, ts("2024-01-01 11:59:59"), 5.0)
  ).toDF("rid", "k2", "t2", "v")

  test("asOfJoin backward: latest right at or before each left row") {
    val got = TemporalJoins.asOfJoin(left, right,
        "k", "t", "k2", "t2", Seq("rid", "v"))
      .select("lid", "rid", "v").sort("lid")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq === Seq(
      (1L, Some(102L), Some(2.0)),
      (2L, Some(103L), Some(3.0)), // equal-ts right row matches
      (3L, None, None),
      (4L, None, None),
      (5L, Some(105L), Some(5.0))))
  }

  test("asOfJoin forward: earliest right at or after each left row") {
    val got = TemporalJoins.asOfJoin(left, right,
        "k", "t", "k2", "t2", Seq("rid"), direction = "forward")
      .select("lid", "rid").sort("lid")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq === Seq(
      (1L, Some(103L)),
      (2L, Some(103L)), // equal-ts right row matches forward too
      (3L, Some(101L)),
      (4L, None),
      (5L, None)))      // no right row at/after 12:00 for key 30
  }

  test("asOfJoin emits every left row exactly once") {
    val joined = TemporalJoins.asOfJoin(left, right,
      "k", "t", "k2", "t2", Seq("rid"))
    assert(joined.count() === left.count())
    assert(joined.select("lid").distinct().count() === left.count())
  }

  test("rangeJoinBinned equals the naive inequality join on real events") {
    val ev = Tables.events(spark, sf)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"))
    val others = ev.select(col("event_id").as("other_id"),
      col("ts").as("other_ts"))
    val binned = TemporalJoins.rangeJoinBinned(
        errors, "ts", others, "other_ts", -60, 60, 120)
      .select("event_id", "other_id")
    val naive = errors.crossJoin(others)
      .filter(unix_micros(col("other_ts"))
        .between(unix_micros(col("ts")) - 60000000L,
          unix_micros(col("ts")) + 60000000L))
      .select("event_id", "other_id")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    assert(binned.count() > 0)
  }

  test("rangeJoinBinned covers windows wider than one bucket") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("lid", "t")
    val r = Seq(
      (1L, ts("2024-01-01 09:56:00")),  // -240 s: inside
      (2L, ts("2024-01-01 10:04:30")),  // +270 s: inside
      (3L, ts("2024-01-01 10:05:30")),  // +330 s: outside
      (4L, ts("2024-01-01 09:54:30"))   // -330 s: outside
    ).toDF("rid", "rt")
    val got = TemporalJoins.rangeJoinBinned(l, "t", r, "rt", -300, 300, 120)
      .select("rid").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  // string checks: AdaptiveSparkPlanExec hides the physical tree
  // from collect(), same as in PlanSpec
  test("temporal joins never plan a nested-loop or cartesian join") {
    for (name <- Seq("asof_join", "range_join")) {
      val plan = TemporalQueries.all(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name plans a pair-explosion join:\n$plan")
    }
  }

  test("asof_join plan is one window over a union, shuffled on the key") {
    val plan = TemporalQueries.all("asof_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a Window node:\n$plan")
    assert(plan.contains("Union"), s"expected a Union node:\n$plan")
  }
}
