package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-event operators ([EXT]): gap-based sessionization and the
  * strict-order step funnel — the two rollups every event pipeline runs
  * before events become features or curricula.
  *
  * Scale shape (100 TB): both operators cost exactly ONE exchange on the
  * user key. Sessionization adds a per-user local sort shared by the lag,
  * the running session index, and the rollup; the funnel needs NO sort at
  * all — each step's threshold is an unordered-frame window min that
  * rides the partition as a column, so `k` steps are `k` window passes
  * over the same partitioning (Spark reuses the exchange). Skew is
  * bounded by the busiest USER, the natural unit of behavioral data.
  */
object Events {

  /** Gap-based sessions: a new session starts at the first event or
    * after more than `gapSec` seconds of silence. Gaps compare on
    * floored epoch seconds — the defined granularity (identical
    * truncation on every engine). Returns one row per session:
    * (userCol, session_idx, n_events, duration_sec).
    */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
               idCol: String, gapSec: Long = 1800L): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    df.filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(idCol), col(userCol), col(tsCol),
        floor(col(tsCol).cast("double")).cast("long").as("__sec"))
      .withColumn("__prev", lag(col("__sec"), 1).over(w))
      .withColumn("__new",
        (col("__prev").isNull || col("__sec") - col("__prev") > gapSec)
          .cast("long"))
      .withColumn("session_idx",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("__sec")) - min(col("__sec"))).as("duration_sec"))
  }

  /** Last-touch attribution: each conversion event is credited to the
    * latest PRECEDING same-user event whose type is in `channels`
    * (`"none"` when no channel event precedes it). One user-key
    * exchange + local sort (the lag frame), then a tiny hash agg.
    * Returns (channel, n_conversions).
    */
  def lastTouch(df: DataFrame, userCol: String, typeCol: String,
                tsCol: String, idCol: String, conversionType: String,
                channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty, "channels must be non-empty")
    require(!channels.contains(conversionType),
      "the conversion type cannot also be a channel")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("__ch",
        last(when(col(typeCol).isin(channels: _*), col(typeCol)),
          ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .groupBy(coalesce(col("__ch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** Strict-order funnel over `steps` (first step-2 event AFTER the
    * first step-1 event, and so on): per-step reach counts and the
    * conversion from the previous stage in integer micro-units
    * (step 0 converts from the all-users base). Long-form output:
    * (step_idx, step, n_reached, conv_from_prev_micro).
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8,
      s"steps out of [1,8]: ${steps.size}")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val wU = Window.partitionBy(col(userCol))
    var cur = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(typeCol), col(tsCol))
    steps.zipWithIndex.foreach { case (st, i) =>
      val after =
        if (i == 0) lit(true) else col(tsCol) > col(s"__t${i - 1}")
      cur = cur.withColumn(s"__t$i",
        min(when(col(typeCol) === st && after, col(tsCol))).over(wU))
    }
    val flagAggs = steps.indices.map(i =>
      max(col(s"__t$i").isNotNull.cast("long")).as(s"__s$i"))
    val perUser = cur.groupBy(col(userCol))
      .agg(flagAggs.head, flagAggs.tail: _*)
    val sumAggs = count(lit(1)).as("__n") +:
      steps.indices.map(i => sum(col(s"__s$i")).as(s"__r$i"))
    val one = perUser.agg(sumAggs.head, sumAggs.tail: _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val base = if (i == 0) col("__n") else col(s"__r${i - 1}")
      struct(
        lit(i.toLong).as("step_idx"),
        lit(st).as("step"),
        col(s"__r$i").as("n_reached"),
        when(base === 0L, 0L).otherwise(
          floor(col(s"__r$i").cast("long") * 1000000L / base))
          .cast("long").as("conv_from_prev_micro"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_reached"),
        col("r.conv_from_prev_micro"))
  }
}
