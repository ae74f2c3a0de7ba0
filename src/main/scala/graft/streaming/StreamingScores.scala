package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Watermarked stream-stream interval join ([EXT]): match each left-side
    * event to right-side events for the same key within
    * [left.ts − lookback, left.ts]. Both sides carry watermarks and the
    * join condition bounds event time in BOTH directions, which is what
    * lets Spark evict buffered state as the watermarks advance — without
    * the time bound a stream-stream join buffers forever. The inner-join
    * streaming counterpart of AsOfJoin's batch plan.
    *
    * Column contract: left has (`key`, `leftTs`, ...), right has (`key`,
    * `rightTs`, ...); ts columns must be distinct names.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      lookback: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
      .drop(r(key))
  }

  /** Stream-static enrichment join ([EXT]): each micro-batch joins the
    * static dimension frame — stateless on the stream side (no watermark,
    * no buffered state; only stream-stream joins buffer). `broadcast`
    * keeps it a broadcast hash join inside every micro-batch, so the
    * stream never shuffles — the streaming analogue of the batch
    * dim-enrichment in q_join_region_revenue, and the shape a curation
    * stream uses to attach per-source metadata on ingest. Left join:
    * events with no dimension row pass through with nulls rather than
    * silently dropping.
    */
  def enrichedStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup ([EXT]: the ingestion-time flavor of
    * Dedup.exactGroups): drop rows whose key was already seen within the
    * watermark horizon. State holds one entry per distinct key and is
    * evicted as the watermark passes — bounded memory on an unbounded
    * stream, the property a plain dropDuplicates (infinite state) lacks at
    * corpus scale. Dedup keys are typically content fingerprints
    * (TextAnalysis.fingerprint), computed scan-side so state stores a
    * 32-char digest, not document bodies.
    */
  def dedupedStream(
      rows: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    rows
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming ingest curation ([EXT]): the batch Curation pipeline's
    * ingest-time counterpart, composed from this file's pieces — a narrow
    * quality/language gate (same predicate family as
    * Curation.qualityFilter), watermark-bounded exact dedup on the
    * content fingerprint (state holds a 32-char digest per distinct doc,
    * never bodies), and a stateless broadcast enrichment against a static
    * dimension. Everything before the sink is either narrow or
    * watermark-bounded, so state cannot grow with the stream.
    *
    * Column contract: `docs` carries (tsCol, textCol, langCol, joinKey).
    */
  def ingestCuration(
      docs: DataFrame,
      dim: DataFrame,
      tsCol: String,
      textCol: String,
      langCol: String,
      joinKey: String,
      cfg: graft.operators.Curation.Config = graft.operators.Curation.Config(
        maxStopRatio = 1.0),
      watermark: String = "2 hours"): DataFrame = {
    // the SAME predicate builder as batch Curation.qualityFilter — the
    // train-time and ingest-time gates cannot drift apart
    val gated = docs
      .filter(graft.operators.Curation.qualityPredicate(textCol, langCol, cfg))
      .withColumn("__fp", graft.operators.TextAnalysis.fingerprint(col(textCol)))
    val deduped = dedupedStream(gated, tsCol, Seq("__fp"), watermark)
      .drop("__fp")
    enrichedStream(deduped, dim, joinKey)
  }

  /** Input/output rows for the custom-state operator. */
  final case class UserEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via flatMapGroupsWithState (SURVEY.md §2.I): running
    * per-user totals that survive across micro-batches — the stateful shape
    * session_window/windowed aggs can't express (no window boundary; state
    * lives until the optional processing-time timeout evicts idle users,
    * bounding memory at cluster scale).
    *
    * `idleTimeout = None` disables eviction (and the timer-driven empty
    * micro-batches it causes — with a timeout set, Spark re-triggers batches
    * continuously to fire timers, which makes `processAllAvailable` in tests
    * chase a moving target). Production streams over unbounded key spaces
    * should pass a timeout.
    */
  def runningUserTotals(events: Dataset[UserEvent],
      idleTimeout: Option[String] = None): Dataset[UserTotals] = {
    implicit val outEnc = Encoders.product[UserTotals]
    implicit val keyEnc = Encoders.scalaLong
    val timeoutConf = idleTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update(), timeoutConf) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
            val batch = rows.toSeq
            val next = UserTotals(userId,
              prev.n_events + batch.size,
              prev.total_value + batch.map(_.value).sum)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(next)
          }
      }
  }
}
