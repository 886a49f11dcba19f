package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel detection — the stateful form of the batch
  * `evt_funnel` query: per-user state tracks the FIRST click; the
  * first purchase at or after it inside `windowUs` emits one
  * conversion row, at most once per user, even when the click and
  * the purchase arrive in different micro-batches.
  *
  * E2 detector shape (like CountWindow): keyed
  * flatMapGroupsWithState, state O(1) per user — two fields — so
  * state size is bounded by the user population, not the event
  * volume. Rows are sorted by event time inside each (user, batch)
  * group; cross-batch disorder beyond that is the caller's watermark
  * problem (pair with `StreamDedup.withinWatermark` upstream).
  */
object FunnelDetector {

  case class FEv(user: Long, ts: Timestamp, kind: String)
  case class FunnelState(clickUs: Long, converted: Boolean) // clickUs < 0: none
  case class Conversion(user: Long, clickUs: Long, delayUs: Long)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  def clickToPurchase(events: Dataset[FEv],
      windowUs: Long): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[FEv], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(-1L, converted = false))
          val out = scala.collection.mutable.ArrayBuffer[Conversion]()
          rows.toSeq.sortBy(e => (micros(e.ts), e.kind)).foreach { e =>
            val us = micros(e.ts)
            e.kind match {
              case "click" if s.clickUs < 0 =>
                s = s.copy(clickUs = us)
              case "purchase" if !s.converted && s.clickUs >= 0 &&
                  us >= s.clickUs && us - s.clickUs <= windowUs =>
                out += Conversion(user, s.clickUs, us - s.clickUs)
                s = s.copy(converted = true)
              case _ => ()
            }
          }
          state.update(s)
          out.iterator
      }
  }
}
