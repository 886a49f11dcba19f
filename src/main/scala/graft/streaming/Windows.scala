package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed aggregation operators (SURVEY §2.9 T6-T11, A5).
  *
  * Each builder works identically on a batch DataFrame and a
  * streaming one — `window`/`session_window` are the same Catalyst
  * operators in both modes, which is exactly how Spark supersedes the
  * reference's hand-maintained window buffers
  * (graph/views/src/windowed_operations.rs). The reference's sliding
  * window is knowingly broken (behaves as tumbling — SURVEY T7);
  * here sliding windows are real. Session gap is a parameter (the
  * reference hardcodes 30 s — windowed_operations.rs:296).
  *
  * For streaming use, apply `withWatermark` first (T2): the
  * reference only COUNTS late events (stream_processing.rs:314-321)
  * while Spark drops them past the watermark — a stricter, documented
  * difference.
  */
object Windows {

  /** A5: the windowed aggregate set — count, sum, avg, min, max,
    * distinct (exact; swap for approx_count_distinct at scale).
    */
  def standardAggs(valueCol: Column, distinctCol: Column): Seq[Column] = Seq(
    count(lit(1)).as("cnt"),
    round(sum(valueCol), 4).as("sum_value"),
    // avg via exact integer cents + a 1e-9 nudge: 2-decimal inputs
    // over integer counts land EXACTLY on round-half boundaries
    // (e.g. 307.03/8 = 38.37875), where Spark's string-based
    // BigDecimal HALF_UP and float-multiply rounders (DuckDB)
    // fundamentally disagree. The nudge pushes halves off the
    // boundary identically in every engine.
    round(round(sum(valueCol) * 100).cast("long") / (count(lit(1)) * 100.0)
      + lit(1e-9), 4).as("avg_value"),
    round(min(valueCol), 4).as("min_value"),
    round(max(valueCol), 4).as("max_value"),
    count_distinct(distinctCol).as("distinct_users"))

  /** T6: tumbling window. */
  def tumbling(df: DataFrame, tsCol: String, duration: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), duration) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** T7: sliding window — an event lands in duration/slide windows. */
  def sliding(df: DataFrame, tsCol: String, duration: String, slide: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** T8: session window with configurable gap; a session extends
    * while consecutive events are within `gap` of the previous one.
    */
  def session(df: DataFrame, tsCol: String, gap: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .drop("session_window")

  /** T10: global (never-closing) window — a running total aggregation;
    * in streaming this runs in update output mode.
    */
  def global(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** T9 (batch form): count-based windows — per key, ordered buckets
    * of `maxEvents` rows. The streaming form with live state is
    * CountWindow.countWindowStream.
    */
  def countWindowBatch(df: DataFrame, tsCol: String, orderTieCol: String,
      key: String, maxEvents: Int, aggs: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(orderTieCol))
    df.withColumn("__bucket",
      ((row_number().over(w) - 1) / maxEvents).cast("long"))
      .groupBy(col(key), col("__bucket").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** T2: watermark wrapper (streaming). */
  def withEventTime(df: DataFrame, tsCol: String, tolerance: String): DataFrame =
    df.withWatermark(tsCol, tolerance)
}
