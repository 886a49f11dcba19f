package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T9: streaming count-based windows — Spark has no native count
  * window, so per-key state tracks a running buffer and emits a
  * window row every `maxEvents` events (SURVEY §4 custom-work item
  * (4): flatMapGroupsWithState).
  *
  * Also E2's detector shape: a stateful 1→N row expansion keyed by
  * entity, the Spark-native form of the reference's PatternDetector
  * trait (realtime_analytics.rs:253-302, dead code there).
  */
object CountWindow {

  case class Ev(key: Long, ts: java.sql.Timestamp, value: Double)
  case class CountState(seen: Long, sum: Double, cnt: Int)
  case class WindowOut(key: Long, windowIndex: Long, cnt: Int, sum: Double)

  /** Emits one row per completed count-window of `maxEvents` events
    * per key. Partial windows stay buffered in state (emitted never —
    * matching the reference's close-at-max_events semantics,
    * windowed_operations.rs:301-304).
    */
  def countWindowStream(events: Dataset[Ev], maxEvents: Int): Dataset[WindowOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[CountState, WindowOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Ev], state: GroupState[CountState]) =>
          var s = state.getOption.getOrElse(CountState(0L, 0.0, 0))
          val out = scala.collection.mutable.ArrayBuffer[WindowOut]()
          rows.foreach { e =>
            val cnt = s.cnt + 1
            val sum = s.sum + e.value
            if (cnt == maxEvents) {
              out += WindowOut(key, s.seen / maxEvents, cnt, sum)
              s = CountState(s.seen + 1, 0.0, 0)
            } else {
              s = CountState(s.seen + 1, sum, cnt)
            }
          }
          state.update(s)
          out.iterator
      }
  }
}
