package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the DECLARATIVE counterpart of
  * the stateful detectors (FunnelDetector keeps O(1) hand-rolled
  * state per key; this lets Spark's symmetric hash join manage the
  * state store instead).
  *
  * The interval join is the streaming form of the batch range join
  * (TemporalJoins.rangeJoin): left rows match right rows with the
  * same key whose event time falls in [leftTs, leftTs + interval].
  * BOTH sides carry watermarks and the join condition bounds the
  * time difference in both directions, which is exactly what lets
  * Spark expire state: a buffered left row can stop waiting once the
  * right watermark passes leftTs + interval, so state size is
  * O(rows in flight inside the interval), never O(stream). Without
  * the time-bound condition Spark must buffer both streams forever —
  * the unbounded-state trap this operator exists to avoid.
  */
object StreamJoins {

  /** Inner interval join: rows of `left` and `right` sharing `keys`
    * with `right.rightTs` in `[left.leftTs, left.leftTs + interval]`.
    *
    * `leftDelay` / `rightDelay` are the per-stream watermark
    * tolerances (how late events may arrive); `interval` is the join
    * window (e.g. "1 hour"). Works unchanged on batch frames
    * (withWatermark is a no-op in batch), so the same code is
    * testable against a batch oracle.
    */
  def intervalJoin(left: DataFrame, leftTs: String, leftDelay: String,
      right: DataFrame, rightTs: String, rightDelay: String,
      keys: Seq[String], interval: String): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equi-key")
    val l = left.withWatermark(leftTs, leftDelay).alias("l")
    val r = right.withWatermark(rightTs, rightDelay).alias("r")
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val timeCond = r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"interval $interval")
    l.join(r, keyCond && timeCond)
  }
}
