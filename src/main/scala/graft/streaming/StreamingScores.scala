package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming surface ([EXT], SURVEY.md §2.I): the reference is
  * batch-only (monthly EMR cadence), so these expose its MQ-score
  * aggregation shape incrementally — watermarked tumbling windows and
  * session windows over an event stream.
  *
  * The plan builders take any DataFrame (batch or streaming) so batch parity
  * is testable: on a stream they compile to stateful aggregations whose
  * state is bounded by the watermark; on a batch frame they produce the same
  * answer as the equivalent groupBy.
  */
object StreamingScores {

  /** Tumbling-window event rollup with a watermark bounding state. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window)
          .getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Per-user session windows (gap-based), the stateful-session analogue. */
  def sessionStats(
      events: DataFrame,
      tsCol: String,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))
}
