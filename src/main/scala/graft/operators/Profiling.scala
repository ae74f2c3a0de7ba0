package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column profiling and snapshot metric drift ([EXT]): the
  * monitoring half of data validation (Schelter et al. VLDB'18 run
  * declarative checks against PROFILED metrics over time; Great
  * Expectations calls this a "data docs" profile). A pipeline ingesting
  * monthly snapshots profiles each one and alarms when a metric moves
  * more than a tolerance relative to the previous snapshot — catching
  * upstream regressions (a provider starts sending nulls, a scraper
  * truncates text, a join starts fanning out) before they poison
  * training data.
  *
  * [[profile]] computes all metrics in ONE aggregation job (same
  * single-agg + explode shape as [[Constraints.audit]]; distinct counts
  * add Expand width, still one job). [[drift]] joins two profiles —
  * two one-row aggregates, broadcast-joined, negligible at any scale —
  * and emits integer micro-unit relative changes (exact cross-engine).
  */
object Profiling {

  /** Columns to profile: numeric columns get null_rate/min/max/avg,
    * string columns get null_rate/avg_len/distinct.
    */
  final case class Spec(numeric: Seq[String], strings: Seq[String])

  /** Long-form per-column metrics: (column, metric, value) with value
    * DOUBLE (rates in micro-units as exact integers-in-double, avgs
    * rounded to 6 decimals — both engine-replayable).
    */
  def profile(df: DataFrame, spec: Spec): DataFrame = {
    val n = count(lit(1))
    def nullRate(c: String): Column =
      when(n === 0L, 0L).otherwise(
        floor((n - count(col(c))).cast("long") * 1000000L / n))
        .cast("double")
    val aggs = scala.collection.mutable.ArrayBuffer[Column]()
    val rows = scala.collection.mutable.ArrayBuffer[(String, String, Int)]()
    def add(colName: String, metric: String, expr: Column): Unit = {
      rows += ((colName, metric, aggs.size))
      aggs += expr.as(s"__m${aggs.size}")
      ()
    }
    for (c <- spec.numeric) {
      add(c, "null_rate_micro", nullRate(c))
      add(c, "min", min(col(c)).cast("double"))
      add(c, "max", max(col(c)).cast("double"))
      add(c, "avg", round(sum(col(c)).cast("double") / count(col(c)), 6))
    }
    for (c <- spec.strings) {
      add(c, "null_rate_micro", nullRate(c))
      add(c, "avg_len",
        round(sum(length(col(c))).cast("double") / count(col(c)), 6))
      add(c, "distinct", countDistinct(col(c)).cast("double"))
    }
    val one = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val structs = rows.map { case (c, m, i) =>
      struct(lit(c).as("column"), lit(m).as("metric"),
        col(s"__m$i").as("value"))
    }
    one.select(explode(array(structs.toSeq: _*)).as("r"))
      .select(col("r.column"), col("r.metric"), col("r.value"))
  }

  /** Population stability index ([EXT]) — THE distribution-drift metric
    * model-monitoring pipelines threshold (PSI < 0.1 stable, > 0.25
    * shifted): bin both snapshots by equi-depth thresholds fitted on
    * the BASELINE (the [[Sampling.equiDepthApprox]] sampled-order-
    * statistics fit — deterministic md5 draw, integer ceil ranks, zero
    * global sorts), then per-bin contributions (p−q)·ln(p/q) with the
    * standard 1e-6 rate floor so empty bins stay finite. Returns one
    * row per bin; the PSI is the sum of `psi_contrib`. Two narrow
    * binning passes + two tiny aggs; thresholds are plan literals, so
    * at 100 TB this is two map-side-combined scans.
    */
  def psi(prev: DataFrame, cur: DataFrame, valueCol: String, idCol: String,
          bins: Int = 10, sampleSize: Int = 200): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of [2,1000]: $bins")
    require(sampleSize >= bins,
      s"sampleSize ($sampleSize) must be >= bins ($bins)")
    val sample = prev
      .orderBy(md5(col(idCol).cast("string")))
      .limit(sampleSize)
      .select(col(valueCol).cast("double").as("v"))
      .collect().map(_.getDouble(0)).sorted
    require(sample.nonEmpty, "psi needs a non-empty baseline snapshot")
    val n = sample.length
    def cutAt(d: Int): Double = sample((n * d + bins - 1) / bins - 1)
    val cuts = (1 until bins).map(cutAt)
    def binCol: Column = {
      val v = col(valueCol).cast("double")
      cuts.foldLeft(lit(1L))((acc, t) =>
        acc + when(lit(t) < v, 1L).otherwise(0L))
    }
    val p = prev.withColumn("bin", binCol)
      .groupBy(col("bin")).agg(count(lit(1)).as("n_prev"))
    val c = cur.withColumn("bin", binCol)
      .groupBy(col("bin")).agg(count(lit(1)).as("n_cur"))
    // materialize the tiny (≤ bins rows) joined frame once: the snapshot
    // totals are exactly the sums of the bin counts (every row lands in
    // a bin — a NULL value compares false against every cut and folds to
    // bin 1), so deriving them from the binned frame saves two FULL
    // rescans of prev/cur that the original count-agg cross-joins paid
    val joined = p.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .localCheckpoint()
    val eps = lit(1e-6)
    val pr = greatest(col("n_prev") / col("__tp"), eps)
    val qr = greatest(col("n_cur") / col("__tc"), eps)
    joined
      .crossJoin(broadcast(joined.agg(
        sum(col("n_prev")).as("__tp"), sum(col("n_cur")).as("__tc"))))
      .select(col("bin"), col("n_prev"), col("n_cur"),
        round((pr - qr) * log(pr / qr), 6).as("psi_contrib"))
  }

  /** Join-skew diagnosis ([EXT]): for a planned equi-join, the top-K
    * keys by estimated output contribution (n_left·n_right) with their
    * share of the total estimated join size — the report that tells you
    * WHICH keys need salting (or an AQE skew split) before you pay for
    * the join itself. Cost: two keys-only aggregates + a key-count
    * join — the exchanges carry (key, count), never rows, so the
    * diagnostic is cheap at any corpus size; the top-K is a
    * TakeOrderedAndProject, not a global sort. NULL keys are excluded
    * (an equi-join drops them). `est_rows` is exact long arithmetic —
    * past ~3e9 matches per key per side the product overflows; counts
    * that large are already the answer.
    */
  def joinSkewReport(left: DataFrame, leftKey: String,
                     right: DataFrame, rightKey: String,
                     topK: Int = 20): DataFrame = {
    require(topK > 0, "topK must be positive")
    def counts(df: DataFrame, k: String, out: String): DataFrame =
      df.filter(col(k).isNotNull).select(col(k).as("key"))
        .groupBy(col("key")).agg(count(lit(1)).as(out))
    // materialize the per-key frame once (eager localCheckpoint, the
    // sibling-operator pattern): it is referenced twice (top-K rows +
    // the broadcast total) and without materialization both keys-only
    // aggregates would re-scan their inputs. A persist() here would
    // outlive the call — nothing ever unpersists it, so a long-lived
    // session leaks one cached RDD per invocation; checkpoint blocks are
    // instead freed by the ContextCleaner once the frame is unreachable.
    // O(distinct matched keys) rows of three longs.
    val m = counts(left, leftKey, "n_left")
      .join(counts(right, rightKey, "n_right"), Seq("key"))
      .withColumn("est_rows", col("n_left") * col("n_right"))
      .localCheckpoint()
    m.crossJoin(broadcast(m.agg(sum(col("est_rows")).as("__t"))))
      .select(col("key"), col("n_left"), col("n_right"), col("est_rows"),
        floor(col("est_rows").cast("long") * 1000000L / col("__t"))
          .cast("long").as("share_micro"))
      .orderBy(col("est_rows").desc, col("key"))
      .limit(topK)
  }

  /** Metric drift between two profiles of the SAME spec: the relative
    * change in integer micro-units and the alarm verdict. Contract for
    * zero/null baselines: prev=0,cur=0 → 0; prev=0,cur≠0 → ±1e6 (a
    * forced full-swing alarm — a metric appearing from nothing is
    * always reportable); either side NULL (empty snapshot min/max/avg)
    * → change 0 with a `defined=false` flag rather than a null-poisoned
    * alarm.
    */
  def drift(prev: DataFrame, cur: DataFrame, tolMicro: Long): DataFrame = {
    val p = prev.withColumnRenamed("value", "prev_value")
    val c = cur.withColumnRenamed("value", "cur_value")
    val joined = p.join(c, Seq("column", "metric"))
    val defined = col("prev_value").isNotNull && col("cur_value").isNotNull
    val change = when(!defined, 0L)
      .when(col("prev_value") === 0.0 && col("cur_value") === 0.0, 0L)
      .when(col("prev_value") === 0.0,
        when(col("cur_value") > 0.0, 1000000L).otherwise(-1000000L))
      .otherwise(floor((col("cur_value") - col("prev_value"))
        * 1000000L / abs(col("prev_value"))).cast("long"))
    joined.select(col("column"), col("metric"),
      col("prev_value"), col("cur_value"),
      change.as("rel_change_micro"),
      defined.as("defined"),
      (defined && abs(change) > tolMicro).as("alarm"))
  }
}
