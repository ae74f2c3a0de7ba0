package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit ([EXT]): the validation
  * pass a production pipeline runs before data is allowed downstream —
  * completeness (non-null rate), value-set membership, numeric range
  * compliance, regex pattern compliance, and key distinctness — in the
  * declarative-checks style of Schelter et al., "Automating Large-Scale
  * Data Quality Verification" (VLDB 2018).
  *
  * The whole check list evaluates in ONE aggregation job: every check
  * contributes a conditional-count column to a single global agg (the
  * same partial-aggregate shape as [[Completeness]]'s 17-agg pass — at
  * 100 TB this is one map-side-combined scan regardless of how many
  * checks are registered), and the one-row result is exploded into the
  * long-form (check, metric, threshold, pass) report a gate consumes.
  * Metrics are exact integer micro-rates (floor(1e6·numerator/rows)) —
  * bit-identical cross-engine, no float thresholds.
  *
  * [[Distinctness]] adds a distinct aggregate (Spark plans the mixed
  * agg via Expand — one extra pass-width per distinct check, still one
  * job); use it sparingly at scale, or measure cardinality with the
  * [[graft.plans]] sketch aggregates when approximate suffices
  * (`q_approx_distinct`).
  */
object Constraints {

  /** One declarative check; `minRateMicro` is the pass threshold in
    * integer micro-units (1e6 = 100%).
    */
  sealed trait Check {
    def name: String
    def minRateMicro: Long
  }

  /** Non-null rate of `column`. */
  final case class Completeness(column: String, minRateMicro: Long)
      extends Check {
    val name = s"completeness($column)"
  }

  /** Rate of rows whose `column` lies in [lo, hi] (nulls fail). */
  final case class InRange(column: String, lo: Double, hi: Double,
                           minRateMicro: Long) extends Check {
    val name = s"in_range($column,$lo,$hi)"
  }

  /** Rate of rows whose `column` is one of `values` (nulls fail). */
  final case class InSet(column: String, values: Seq[String],
                         minRateMicro: Long) extends Check {
    val name = s"in_set($column)"
  }

  /** Rate of rows whose `column` matches `regex` (nulls fail). Keep the
    * pattern in the Java∩RE2 subset if the report must be replayed by
    * another engine (the [[Redaction]] rule).
    */
  final case class MatchesRegex(column: String, regex: String,
                                minRateMicro: Long) extends Check {
    val name = s"matches_regex($column)"
  }

  /** distinct(`columns`) / rows — 1e6 means the key is unique. Adds a
    * distinct aggregate to the pass (see object scaladoc).
    */
  final case class Distinctness(columns: Seq[String], minRateMicro: Long)
      extends Check {
    val name = s"distinctness(${columns.mkString(",")})"
  }

  private def numerator(c: Check): Column = c match {
    case Completeness(col0, _) => count(col(col0))
    case InRange(col0, lo, hi, _) =>
      count(when(col(col0) >= lo && col(col0) <= hi, 1))
    case InSet(col0, vs, _) => count(when(col(col0).isin(vs: _*), 1))
    case MatchesRegex(col0, re, _) => count(when(col(col0).rlike(re), 1))
    case Distinctness(cols, _) => countDistinct(col(cols.head),
      cols.tail.map(col): _*)
  }

  /** Run `checks` over `df`: one row per check with the measured
    * micro-rate, the threshold, and the pass verdict. One aggregation
    * job; empty input fails every check (metric 0) rather than
    * vacuously passing.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique (same check registered twice?)")
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case (c, i) => numerator(c).as(s"__c$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val metric = when(col("__n") === 0L, 0L)
        .otherwise(floor(col(s"__c$i").cast("long") * 1000000L / col("__n")))
        .cast("long")
      struct(
        lit(c.name).as("check"),
        metric.as("metric_micro"),
        lit(c.minRateMicro).as("threshold_micro"),
        (metric >= c.minRateMicro).as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.metric_micro"),
        col("r.threshold_micro"), col("r.pass"))
  }

  /** Referential-integrity audit between two tables: orphaned child
    * rows (non-null foreign keys absent from the parent — NULL keys are
    * reported separately, SQL FK semantics) and parent-side coverage
    * (keys never referenced). Both sides join on DISTINCT key frames —
    * at 100 TB the exchanges carry keys only, never rows, and the
    * child-side agg collapses map-side; the two one-row aggregates
    * cross-join for free.
    */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   relation: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    val ck = child.select(col(childKey).as("__ck"))
    val childAgg = ck
      .join(pk, col("__ck") === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        count(when(col("__ck").isNull, 1)).as("n_null_key"),
        count(when(col("__ck").isNotNull && col("__pk").isNull, 1))
          .as("n_orphans"))
    val parentAgg = pk
      .join(ck.where(col("__ck").isNotNull).distinct(),
        col("__pk") === col("__ck"), "left")
      .agg(count(lit(1)).as("n_parent"),
        count(when(col("__ck").isNull, 1)).as("n_unreferenced_parent"))
    childAgg.crossJoin(parentAgg).select(
      lit(relation).as("relation"),
      col("n_child"), col("n_null_key"), col("n_orphans"),
      when(col("n_child") === 0L, 0L)
        .otherwise(floor(col("n_orphans").cast("long") * 1000000L
          / col("n_child"))).cast("long").as("orphan_rate_micro"),
      col("n_parent"), col("n_unreferenced_parent"),
      when(col("n_parent") === 0L, 0L)
        .otherwise(floor(
          (col("n_parent") - col("n_unreferenced_parent")).cast("long")
            * 1000000L / col("n_parent"))).cast("long")
        .as("coverage_micro"))
  }

  /** Streaming variant: the same check list per event-time window — the
    * continuous data-quality gate an ingest pipeline runs (alert when a
    * window's completeness drops). Same conditional-count aggregation,
    * grouped by the window STRUCT (projecting the field before the agg
    * strips watermark metadata and state never evicts — the
    * windowedCounts rule); the explode to long form is stateless and
    * rides after the stateful agg. [[Distinctness]] is rejected:
    * streaming aggregation does not support distinct aggregates — use
    * `approx_count_distinct` reporting (windowedDataCard) when
    * cardinality monitoring is needed on a stream.
    *
    * Works identically on a batch frame (the parity StreamingSpec
    * pins): event-time windows are ordinary expressions.
    */
  def auditWindowed(df: DataFrame, tsCol: String, windowDur: String,
                    watermark: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "auditWindowed needs at least one check")
    require(!checks.exists(_.isInstanceOf[Distinctness]),
      "Distinctness is not supported on streams (no distinct aggregates " +
        "in streaming aggregation); use approx_count_distinct reporting")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique (same check registered twice?)")
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case (c, i) => numerator(c).as(s"__c$i") }
    val windowed = base
      .groupBy(window(col(tsCol), windowDur).as("__w"))
      .agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val metric = when(col("__n") === 0L, 0L)
        .otherwise(floor(col(s"__c$i").cast("long") * 1000000L / col("__n")))
        .cast("long")
      struct(
        lit(c.name).as("check"),
        metric.as("metric_micro"),
        lit(c.minRateMicro).as("threshold_micro"),
        (metric >= c.minRateMicro).as("pass"))
    }
    windowed
      .select(col("__w").getField("start").as("window_start"),
        explode(array(rows: _*)).as("r"))
      .select(col("window_start"), col("r.check"), col("r.metric_micro"),
        col("r.threshold_micro"), col("r.pass"))
  }
}
