package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table (SURVEY.md §2B last row).
  *
  * Batch-first design: the same transformations run unchanged on a static
  * DataFrame (`spark.read`) and on a stream (`spark.readStream`) — Spark's
  * unified API. Streaming specifics (watermarks, stateful dedup) appear only
  * in the `stream*` variants; `StreamingSpec` exercises them with a
  * MemoryStream source.
  *
  * Scale: windowed aggregation shuffles on (window, key); watermarks bound
  * state size so a 1000-executor streaming job does not accumulate
  * unbounded per-key state.
  */
object Streams {

  /** Tumbling event-time window aggregation (batch or stream). */
  def tumblingCounts(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding window aggregation. */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows (gap-based). Works in batch and streaming. */
  def sessionCounts(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n"))

  /** Streaming variant with watermark — late data beyond `delay` dropped,
    * state pruned. */
  def streamTumblingCounts(events: DataFrame, width: String, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming dedup within the watermark horizon. */
  def streamDedup(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
}
