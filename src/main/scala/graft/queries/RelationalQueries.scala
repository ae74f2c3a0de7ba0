package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational [EXT] surface (SURVEY.md §2.D/E): the join family, windows,
  * top-k, rollup/grouping sets, set ops, and distinct aggregates that the
  * reference's id-keyed pipeline implies but never materializes as DataFrame
  * ops (its only set op is union — JsonlDump.scala:51).
  *
  * Scale notes (100 TB): every query here is written so Catalyst gets the
  * plan it needs at cluster scale — dimension tables (`region`, `nation`,
  * `supplier`, small `customer` slices) are explicitly `broadcast()` so fact
  * scans never shuffle for them; aggregates are partial+final hash aggs
  * (map-side combined); windows partition by high-cardinality keys so no
  * single partition collapses; top-k uses `orderBy.limit` which Spark plans
  * as TakeOrderedAndProject (per-partition heap, O(k) driver transfer).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fixed-iteration PageRank, ORACLED end to end: a deterministic
    // 2-out-regular graph synthesized from documents (so the oracle can
    // rebuild the identical edge list), 3 power rounds with ranks
    // rounded to 8 decimals per round — DuckDB unrolls the same rounds,
    // so the hash gate covers the whole iterative computation. The
    // fixture graph has no dangling nodes (every node has out-degree
    // 2); the operator's dangling redistribution is spec-tested on a
    // hand-computed graph instead.
    "q_pagerank" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val n = d.count()
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % n).as("dst"))
        .union(d.select(col("doc_id").as("src"),
          ((col("doc_id") * 13 + 5) % n).as("dst")))
      graft.operators.PageRank.run(edges, "src", "dst", iters = 3)
    }),

    // TPC-H Q5 shape: 5-way join w/ broadcast dims, grouped revenue.
    "q_join_region_revenue" -> ((s, dir) => {
      val nation = broadcast(t(s, dir, "nation"))
      val region = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Salted skew join, ORACLED: the salting is PHYSICAL (left rows get a
    // deterministic salt, the dim replicates buckets x, pairs meet on
    // (key, salt)), so the result is row-identical to the plain equi-join
    // DuckDB runs — which is exactly what makes the skew remedy safe to
    // drop into a pipeline. The rollup keys on the dim attribute so the
    // oracle hash proves every fact row met its dim row exactly once
    // (a salting bug — wrong modulus, missed replica — breaks the count).
    "q_salted_join" -> ((s, dir) => {
      val fact = t(s, dir, "orders")
        .select(col("o_custkey").as("k"), col("o_totalprice"))
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment"))
      graft.operators.SkewJoin
        .saltedInnerJoin(fact, dim, "k", buckets = 8,
          saltCols = Seq(col("o_totalprice")))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("total_price"))
    }),

    // TPC-H Q6 shape: pure scan+filter+sum — the predicate-pushdown probe
    // (all four predicates reach the parquet reader as PushedFilters).
    "q_filter_sum" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp'1997-01-01 00:00:00'") &&
          col("l_discount").between(0.03, 0.05) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
          .as("revenue"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q3 shape: top-10 orders by revenue, deterministic tiebreak.
    // orderBy+limit ⇒ TakeOrderedAndProject (no global sort shuffle).
    "q_topk_orders" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Left-semi: customers with at least one finished order.
    "q_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Left-anti: customers with no pending orders.
    "q_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Left-outer + count: order count per customer including zero.
    "q_outer_join_counts" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    // Window rank: top-2 orders per customer by price, deterministic.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // Window running aggregate over a time frame spec.
    "q_window_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w), 4).as("running_value"))
    }),

    // Range-frame running aggregate: per-user value sum over the trailing
    // hour (rangeBetween on epoch-millis — both engines frame peers by
    // value distance, not row position).
    "q_window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"))
        .rangeBetween(-3600000L, 0L)
      t(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
        .select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w), 4).as("hour_value"))
    }),

    // Rollup over the D1/D2 group hierarchy (null groups labeled ALL so
    // Spark and the oracle agree without grouping_id).
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
    }),

    // Grouping sets mirroring the reference's provider/(provider,contributor)
    // two-report pair (MqReports.scala:93-134) as ONE pass over the data.
    "q_grouping_sets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.createOrReplaceTempView("gs_documents")
      s.sql("""SELECT source, coalesce(lang, 'ALL') AS lang,
                      count(*) AS n, round(avg(n_chars), 4) AS avg_chars
               FROM gs_documents
               GROUP BY GROUPING SETS ((source), (source, lang))""")
    }),

    // Set ops: building-segment customers who do have open orders.
    "q_intersect" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .intersect(t(s, dir, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey")))
    }),

    "q_except" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_custkey"))
        .except(t(s, dir, "orders").filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("c_custkey")))
    }),

    // E1 n-way union (JsonlDump.scala:51 idiom) via unionByName.
    "q_union_slices" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), lit("urgent").as("slice"))
      val high = o.filter(col("o_orderpriority") === "2-HIGH")
        .select(col("o_orderkey"), lit("high").as("slice"))
      val big = o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), lit("big").as("slice"))
      Seq(urgent, high, big).reduce(_.unionByName(_))
        .groupBy(col("slice")).agg(count(lit(1)).as("n"))
    }),

    // Approximate distinct (HLL++): deterministic (register merges are
    // order-independent) but engine-specific, so rows-only — the exact
    // variant below is the oracle-checked counterpart. At 100 TB this is
    // the one that matters: O(1) state per group vs the exact expand.
    "q_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          count(lit(1)).as("n"))
    }),

    // Exact distinct aggregate (Spark plans expand + two-phase agg).
    "q_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    }),

    // MQ CASE/LIKE flag family on TPC-H columns (MqReports.scala:25-92 shape).
    "q_case_flags" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderstatus"),
          when(col("o_orderpriority").like("1-%") ||
            col("o_orderpriority").like("2-%"), 1).otherwise(0).as("high_prio"),
          when(col("o_totalprice") > 200000, 1).otherwise(0).as("big_order"))
        .withColumn("urgent_big",
          when(col("high_prio") === 1 && col("big_order") === 1, 1).otherwise(0))
        .groupBy(col("o_orderstatus"))
        .agg(avg(col("high_prio")).as("high_prio"),
          avg(col("big_order")).as("big_order"),
          avg(col("urgent_big")).as("urgent_big"),
          count(lit(1)).as("n"))
    }),

    // G1/G2/G4: uri build → id extract → 4-level thumbnail key fan-out,
    // all in-plan (reference does G4 in Scala on the driver —
    // ThumbnailPurge.scala:31-33).
    "q_id_fanout" -> ((s, dir) => {
      val id0 = lpad(col("doc_id").cast("string"), 4, "0")
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("http://dp.la/api/items/"), id0).as("uri"))
        .withColumn("item_id",
          substring_index(col("uri"), "http://dp.la/api/items/", -1))
        .withColumn("thumb_key",
          concat_ws("/",
            substring(col("item_id"), 1, 1), substring(col("item_id"), 2, 1),
            substring(col("item_id"), 3, 1), substring(col("item_id"), 4, 1),
            concat(col("item_id"), lit(".jpg"))))
        .select(col("doc_id"), col("item_id"), col("thumb_key"))
    }),

    // E2 in-plan latest-snapshot: max_by per key (vs driver-side
    // sorted.lastOption in S3FileHelper.scala:27).
    "q_max_by" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max_by(col("event_id"), struct(col("ts"), col("event_id")))
          .as("last_event_id"),
          max(col("ts")).as("last_ts"))
    }),

    // Date functions over the order timeline (G9 in-plan equivalents).
    "q_date_parts" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 4).as("total"))
    }),

    // ORACLED per-user session features ([EXT]): the feature rollup a
    // behavioral model trains on — session count, events-per-session
    // micro-mean, activity span, converter flag. Composes the
    // sessionization rollup (one user exchange) with a per-user event
    // agg; the join keys both sides on user_id (co-partitioned).
    "q_session_features" -> ((s, dir) => {
      val sess = graft.operators.Events.sessions(
          t(s, dir, "events"), "user_id", "ts", "event_id")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("duration_sec")).as("max_session_sec"))
      val conv = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long"))
          .as("converted"),
          (max(floor(col("ts").cast("double")).cast("long"))
            - min(floor(col("ts").cast("double")).cast("long")))
            .as("span_sec"))
      sess.join(conv, "user_id")
        .select(col("user_id"), col("n_sessions"), col("n_events"),
          floor(col("n_events").cast("long") * 1000000L
            / col("n_sessions")).cast("long")
            .as("events_per_session_micro"),
          col("max_session_sec"), col("span_sec"), col("converted"))
    }),

    // ORACLED last-touch attribution ([EXT]): each purchase credited to
    // the latest preceding same-user view/click ('none' when nothing
    // precedes). One user exchange + local sort, tiny hash agg.
    "q_attribution" -> ((s, dir) =>
      graft.operators.Events.lastTouch(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id",
        conversionType = "purchase", channels = Seq("view", "click"))),

    // ORACLED retention cohorts ([EXT]): users grouped by first-seen
    // day, activity counted per (cohort_day, days_since) — the classic
    // retention triangle. One user_id exchange (the cohort day rides
    // the partition as a window min), then one hash agg with a distinct
    // count; day arithmetic is integer datediff.
    "q_retention" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wU = Window.partitionBy(col("user_id"))
      val day = col("ts").cast("date")
      t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), day.as("day"))
        .withColumn("cohort_day", min(col("day")).over(wU))
        .withColumn("age_days",
          datediff(col("day"), col("cohort_day")).cast("long"))
        .groupBy(col("cohort_day"), col("age_days"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),

    // ORACLED ordered funnel ([EXT]): view -> click -> purchase with
    // STRICT ordering (first click AFTER the first view, first purchase
    // AFTER that click) — the sequential-conversion report, computed
    // with three unordered-frame window mins over ONE user_id exchange
    // (no joins, no sorts: each stage's threshold rides the partition
    // as a column). Integer micro conversion rates.
    "q_funnel" -> ((s, dir) => {
      // first-36-hours slice: with the full month every user completes
      // the funnel (constant report) — the bounded window makes the
      // conversion rates discriminate
      graft.operators.Events.funnel(
        t(s, dir, "events")
          .filter(col("ts") < lit("2024-01-02 12:00:00").cast("timestamp")),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
    }),

    // ORACLED gap-based sessionization ([EXT]): events split into
    // sessions per user at >30-minute silences — the canonical
    // behavioral-data shape (one exchange on user_id, per-user local
    // sort; the same window serves the lag, the running session index,
    // and the per-session rollup). Gaps compare on floored epoch
    // seconds (the defined granularity — identical truncation on both
    // engines). Report = (user, session, n_events, duration_sec).
    "q_sessionize" -> ((s, dir) =>
      graft.operators.Events.sessions(
        t(s, dir, "events"), "user_id", "ts", "event_id", gapSec = 1800L)),

    // ORACLED recency-weighted sampling ([EXT]): keep an event with
    // probability 1/(1 + age_days) via the portable md5 unit draw — the
    // time-decayed mixture a continuously-ingesting pipeline uses to
    // favor fresh data without dropping history. Rational decay on
    // purpose (no exp — not cross-engine bit-stable); the acceptance
    // compare is exact: both sides are the same IEEE division of exact
    // integers vs the same 2^-32-quantized draw. One narrow scan pass.
    "q_recency_sample" -> ((s, dir) => {
      val anchor = lit("2024-02-01").cast("date")
      val age = datediff(anchor, col("ts").cast("date")).cast("long")
      t(s, dir, "events").filter(col("ts").isNotNull)
        .select(col("event_id"), age.as("age_days"))
        .filter(graft.operators.Sampling.md5Unit(col("event_id"), "fresh ")
          < lit(1.0) / (lit(1.0) + col("age_days").cast("double")))
    }),

    // JSON scalar extraction from the events props column.
    "q_json_get" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    }),

    // Tumbling time window (Structured-Streaming-compatible shape, run in
    // batch; SURVEY §2.I) — daily event rollup.
    "q_time_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").getField("start").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
    }),

    // Range join: lineitems shipped within 60 days of their order date.
    // Equi key + range predicate ⇒ sort-merge join with post-filter, no
    // cartesian; at 100 TB the equi key keeps this a plain shuffle join.
    "q_range_join" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_fast_items"))
    }),

    // Gap-based sessionization in BATCH via session_window (the same plan
    // builder streams with a watermark — SURVEY §2.I). The oracle rebuilds
    // sessions relationally (lag → new-session flag → running sum), proving
    // the gap semantics match: a ts exactly `gap` after its predecessor
    // starts a NEW session (session_window spans are half-open).
    "q_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"), col("total"))
    }),

    // As-of join: each purchase event picks the user's latest signup event
    // at-or-before it (union+window plan — see AsOfJoin scaladoc).
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"),
          col("event_id").as("signup_event_id"))
      graft.operators.AsOfJoin.asOf(
        purchases, signups,
        key = "user_id", leftTs = "ts", rightTs = "signup_ts",
        rightCols = Seq("signup_event_id"))
        .select(col("event_id"), col("user_id"), col("signup_event_id"))
    }),

    // Exact interpolated percentiles per group (sort-based aggregate; at
    // scale swap to approx_percentile for one-pass sketching — the exact
    // form is the oracle-checkable baseline).
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 4).as("med_qty"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 4)
            .as("p90_price"))
    }),

    // Rows-only: one-pass percentile sketch (the scale path for
    // q_percentiles' exact sort-based form; merge order varies with
    // partitioning so no cross-engine hash oracle — proximity to the exact
    // values is asserted in OperatorSpec instead). The sketch array is
    // projected to scalar columns so the rows-only checker can sort rows.
    "q_approx_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)).as("approx_p"))
        .select(col("l_returnflag"),
          element_at(col("approx_p"), 1).as("p50"),
          element_at(col("approx_p"), 2).as("p90"))
    }),

    // Second-moment aggregates (Welford-style partial+final merge, one
    // pass, map-side combined).
    "q_stats_moments" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(stddev_samp(col("o_totalprice")), 4).as("sd_price"),
          round(avg(col("o_totalprice")), 4).as("avg_price"),
          count(lit(1)).as("n"))
    }),

    // Bivariate aggregates: correlation + sample covariance.
    "q_corr_covar" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(corr(col("value"), col("user_id").cast("double")), 4).as("c"),
          round(covar_samp(col("value"), col("user_id").cast("double")), 4)
            .as("cv"))
    }),

    // lag/ntile/first_value over one per-user ordered window: event-to-event
    // value delta, activity quartile, first event id. One exchange on
    // user_id serves all three frames.
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value") - lag(col("value"), 1, 0.0).over(w), 4).as("dv"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("event_id")).over(w).as("first_ev"))
    }),

    // Pivot: long→wide on a bounded value list (explicit values keep the
    // plan a single pass — value discovery would add a distinct scan).
    // count() yields null for absent cells; coalesce to 0 to match the
    // oracle's FILTER counts.
    "q_pivot_langs" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val p = t(s, dir, "documents")
        .groupBy(col("source"))
        .pivot("lang", langs)
        .agg(count(lit(1)))
      p.select(col("source") +:
        langs.map(l => coalesce(col(l), lit(0L)).cast("long").as(l)): _*)
    }),

    // Bloom prefilter under an exact semi join: the prefilter is a
    // superset pass, so the final result is EXACTLY the plain semi join —
    // which is what the oracle checks, proving no-false-negatives inside
    // the correctness gate itself.
    "q_bloom_semi" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val pre = graft.operators.BloomPrefilter.semiFilter(
        t(s, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey",
        expectedItems = 100000L, numBits = 800000L)
      pre.join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 4).as("qty"))
    }),

    // Full cube over the (source, lang) hierarchy — completes the
    // rollup/grouping-sets family (SURVEY §2.D note).
    "q_cube" -> ((s, dir) => {
      t(s, dir, "documents")
        .cube(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"))
    }),

    // Schema-drift union: unionByName(allowMissingColumns) aligns slices
    // with different column subsets, typed-null-filling the gaps — the
    // in-plan version of the reference's cross-provider drift handling
    // (SURVEY §2.E1; SchemaRepair's concern as a set op).
    "q_union_by_name" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val a = d.filter(col("doc_id") < 250)
        .select(col("doc_id"), col("lang"))
      val b = d.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("source"), col("n_chars"))
      a.unionByName(b, allowMissingColumns = true)
    }),

    // Typed JSON parse: from_json with an explicit schema (vs q_json_get's
    // per-path string extraction) — one parse per row feeding any number of
    // fields, the right shape when several keys are read at scale.
    "q_from_json" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        // % (not pmod) — matches the oracle's % on negative values too
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("k_sum"))
    }),

    // Fixed-width histogram binning (floor math — deterministic, unlike
    // width_bucket edge handling across engines).
    "q_value_histogram" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(floor(col("value") / 25).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 4).as("lo"),
          round(max(col("value")), 4).as("hi"))
    }),

    // Systematic deterministic sample (id mod K): the oracle-checkable
    // cousin of Sampling.uniform — same every run, any partitioning.
    "q_sample_systematic" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 4).as("total"))
    }),

    // Unpivot (melt): wide per-source means back to (metric, value) rows.
    "q_unpivot_scores" -> ((s, dir) => {
      val wide = t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(round(avg(col("n_chars")), 4).as("avg_chars"),
          round(avg(length(col("text"))), 4).as("avg_len"))
      wide.unpivot(Array(col("source")),
        Array(col("avg_chars"), col("avg_len")), "metric", "value")
    }),
  )

  /** One unrolled PageRank power round: `next` from `prev`, matching
    * PageRank.run's arithmetic op-for-op (explicit DOUBLE casts — bare
    * decimal literals are DECIMAL in DuckDB, an ulp off IEEE).
    */
  private def prRound(prev: String, next: String): String =
    s"""$next AS (
         SELECT nd.node,
           round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n.c +
             CAST(0.85 AS DOUBLE) *
               coalesce(s.inr, CAST(0 AS DOUBLE)), 8) AS rank
         FROM nodes nd CROSS JOIN n
         LEFT JOIN (
           SELECT e.dst AS node, sum(r.rank / deg.d) AS inr
           FROM e JOIN $prev r ON e.src = r.node
                  JOIN deg ON e.src = deg.src
           GROUP BY e.dst) s ON nd.node = s.node)"""

  val oracles: Map[String, String] = Map(
    // PageRank replay: identical synthesized edge list, identical three
    // rounds with per-round 8-decimal rounding.
    "q_pagerank" ->
      s"""WITH n AS (SELECT count(*) AS c FROM documents),
         e AS (
           SELECT doc_id AS src, (doc_id * 7 + 3) % n.c AS dst
           FROM documents, n
           UNION ALL
           SELECT doc_id AS src, (doc_id * 13 + 5) % n.c AS dst
           FROM documents, n),
         nodes AS (
           SELECT DISTINCT node FROM (
             SELECT src AS node FROM e
             UNION ALL SELECT dst AS node FROM e) u),
         deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         r0 AS (
           SELECT node, round(CAST(1 AS DOUBLE) / n.c, 8) AS rank
           FROM nodes, n),
         ${prRound("r0", "r1")},
         ${prRound("r1", "r2")},
         ${prRound("r2", "r3")}
         SELECT node, rank FROM r3""",

    "q_percentiles" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
         FROM lineitem GROUP BY l_returnflag""",

    "q_stats_moments" ->
      """SELECT o_orderpriority,
           round(stddev_samp(o_totalprice), 4) AS sd_price,
           round(avg(o_totalprice), 4) AS avg_price,
           count(*) AS n
         FROM orders GROUP BY o_orderpriority""",

    "q_corr_covar" ->
      """SELECT event_type,
           round(corr(value, CAST(user_id AS DOUBLE)), 4) AS c,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cv
         FROM events GROUP BY event_type""",

    "q_window_lag" ->
      """SELECT event_id, user_id,
           round(value - lag(value, 1, 0.0) OVER
             (PARTITION BY user_id ORDER BY ts, event_id), 4) AS dv,
           CAST(ntile(4) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS quartile,
           first_value(event_id) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS first_ev
         FROM events""",

    "q_pivot_langs" ->
      """SELECT source,
           count(*) FILTER (WHERE lang = 'de') AS de,
           count(*) FILTER (WHERE lang = 'en') AS en,
           count(*) FILTER (WHERE lang = 'es') AS es,
           count(*) FILTER (WHERE lang = 'fr') AS fr,
           count(*) FILTER (WHERE lang = 'zh') AS zh
         FROM documents GROUP BY source""",

    "q_bloom_semi" ->
      """SELECT count(*) AS n, round(sum(l_quantity), 4) AS qty
         FROM lineitem
         WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""",

    "q_cube" ->
      """SELECT source, lang, count(*) AS n
         FROM documents GROUP BY CUBE (source, lang)""",

    "q_union_by_name" ->
      """SELECT doc_id, lang, NULL AS source, NULL AS n_chars
         FROM documents WHERE doc_id < 250
         UNION ALL
         SELECT doc_id, NULL AS lang, source, n_chars
         FROM documents WHERE doc_id >= 250""",

    "q_from_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum
         FROM events GROUP BY 1""",

    "q_value_histogram" ->
      """SELECT CAST(floor(value / 25) AS BIGINT) AS bucket,
           count(*) AS n, round(min(value), 4) AS lo, round(max(value), 4) AS hi
         FROM events GROUP BY 1""",

    "q_sample_systematic" ->
      """SELECT count(*) AS n, round(sum(l_extendedprice), 4) AS total
         FROM lineitem WHERE l_orderkey % 97 = 0""",

    "q_unpivot_scores" ->
      """WITH wide AS (
           SELECT source, round(avg(n_chars), 4) AS avg_chars,
             round(avg(length(text)), 4) AS avg_len
           FROM documents GROUP BY source)
         SELECT source, 'avg_chars' AS metric, avg_chars AS value FROM wide
         UNION ALL
         SELECT source, 'avg_len' AS metric, avg_len AS value FROM wide""",

    "q_salted_join" ->
      """SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "q_join_region_revenue" ->
      """SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
         FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name""",

    "q_filter_sum" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.03 AND 0.05
           AND l_quantity < 24""",

    "q_topk_orders" ->
      """SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey
         LIMIT 10""",

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""",

    "q_outer_join_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 2""",

    "q_window_running_sum" ->
      """SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 4) AS running_value
         FROM events""",

    "q_window_range_frame" ->
      """SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                                  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW),
                 4) AS hour_value
         FROM events""",

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q_grouping_sets" ->
      """SELECT source, coalesce(lang, 'ALL') AS lang,
           count(*) AS n, round(avg(n_chars), 4) AS avg_chars
         FROM documents
         GROUP BY GROUPING SETS ((source), (source, lang))""",

    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'""",

    "q_except" ->
      """SELECT c_custkey FROM customer
         EXCEPT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'""",

    "q_union_slices" ->
      """SELECT slice, count(*) AS n FROM (
           SELECT o_orderkey, 'urgent' AS slice FROM orders
             WHERE o_orderpriority = '1-URGENT'
           UNION ALL
           SELECT o_orderkey, 'high' AS slice FROM orders
             WHERE o_orderpriority = '2-HIGH'
           UNION ALL
           SELECT o_orderkey, 'big' AS slice FROM orders
             WHERE o_totalprice > 400000)
         GROUP BY slice""",

    "q_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag""",

    "q_case_flags" ->
      """SELECT o_orderstatus,
           avg(CASE WHEN o_orderpriority LIKE '1-%'
                      OR o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END) AS high_prio,
           avg(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS big_order,
           avg(CASE WHEN (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
                     AND o_totalprice > 200000 THEN 1 ELSE 0 END) AS urgent_big,
           count(*) AS n
         FROM orders GROUP BY o_orderstatus""",

    "q_id_fanout" ->
      """SELECT doc_id,
           lpad(CAST(doc_id AS VARCHAR), 4, '0') AS item_id,
           concat_ws('/',
             substr(lpad(CAST(doc_id AS VARCHAR), 4, '0'), 1, 1),
             substr(lpad(CAST(doc_id AS VARCHAR), 4, '0'), 2, 1),
             substr(lpad(CAST(doc_id AS VARCHAR), 4, '0'), 3, 1),
             substr(lpad(CAST(doc_id AS VARCHAR), 4, '0'), 4, 1),
             lpad(CAST(doc_id AS VARCHAR), 4, '0') || '.jpg') AS thumb_key
         FROM documents""",

    "q_max_by" ->
      """SELECT user_id, event_id AS last_event_id, ts AS last_ts FROM (
           SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""",

    // same session CTE chain as q_sessionize, rolled up per user and
    // joined with the converter/span agg
    "q_session_features" ->
      """WITH e AS (
           SELECT event_id, user_id, ts, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         l AS (
           SELECT *,
             lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_sec
           FROM e),
         sx AS (
           SELECT *,
             sum(CAST(prev_sec IS NULL OR sec - prev_sec > 1800
               AS BIGINT)) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_idx
           FROM l),
         sess0 AS (
           SELECT user_id, session_idx, count(*) AS n_ev,
             max(sec) - min(sec) AS dur
           FROM sx GROUP BY user_id, session_idx),
         sess AS (
           SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n_ev) AS BIGINT) AS n_events,
             CAST(max(dur) AS BIGINT) AS max_session_sec
           FROM sess0 GROUP BY user_id),
         conv AS (
           SELECT user_id,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS converted,
             CAST(max(sec) - min(sec) AS BIGINT) AS span_sec
           FROM e GROUP BY user_id)
       SELECT s.user_id, s.n_sessions, s.n_events,
         CAST(floor(s.n_events * 1000000.0 / s.n_sessions) AS BIGINT)
           AS events_per_session_micro,
         s.max_session_sec, c.span_sec, c.converted
       FROM sess s JOIN conv c ON c.user_id = s.user_id""",

    // same preceding-frame IGNORE NULLS last_value, same 'none' default
    "q_attribution" ->
      """WITH e AS (
           SELECT user_id, event_type, ts, event_id FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         a AS (
           SELECT *,
             last_value(CASE WHEN event_type IN ('view', 'click')
               THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
           FROM e)
       SELECT coalesce(ch, 'none') AS channel,
         count(*) AS n_conversions
       FROM a WHERE event_type = 'purchase'
       GROUP BY coalesce(ch, 'none')""",

    // same first-seen window min, same integer day arithmetic
    "q_retention" ->
      """WITH e AS (
           SELECT user_id, CAST(ts AS DATE) AS day FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         c AS (
           SELECT *, min(day) OVER (PARTITION BY user_id) AS cohort_day
           FROM e)
       SELECT cohort_day,
         CAST(date_diff('day', cohort_day, day) AS BIGINT) AS age_days,
         count(DISTINCT user_id) AS n_active
       FROM c GROUP BY cohort_day, age_days""",

    // same strict-order window mins, same micro-rate math (long form)
    "q_funnel" ->
      """WITH e AS (
           SELECT user_id, event_type, ts FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND ts < TIMESTAMP '2024-01-02 12:00:00'),
         a AS (
           SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
           FROM e),
         b AS (
           SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
             THEN ts END) OVER (PARTITION BY user_id) AS t2
           FROM a),
         c AS (
           SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
             THEN ts END) OVER (PARTITION BY user_id) AS t3
           FROM b),
         u AS (
           SELECT user_id,
             max(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS s1,
             max(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS s2,
             max(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS s3
           FROM c GROUP BY user_id),
         f AS (
           SELECT count(*) AS n, CAST(sum(s1) AS BIGINT) AS r0,
             CAST(sum(s2) AS BIGINT) AS r1, CAST(sum(s3) AS BIGINT) AS r2
           FROM u)
       SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
         r0 AS n_reached,
         CASE WHEN n = 0 THEN 0 ELSE CAST(floor(r0 * 1000000.0 / n)
           AS BIGINT) END AS conv_from_prev_micro FROM f
       UNION ALL
       SELECT CAST(1 AS BIGINT), 'click', r1,
         CASE WHEN r0 = 0 THEN 0 ELSE CAST(floor(r1 * 1000000.0 / r0)
           AS BIGINT) END FROM f
       UNION ALL
       SELECT CAST(2 AS BIGINT), 'purchase', r2,
         CASE WHEN r1 = 0 THEN 0 ELSE CAST(floor(r2 * 1000000.0 / r1)
           AS BIGINT) END FROM f""",

    // same floored-second gaps, same lag/running-sum windows
    "q_sessionize" ->
      """WITH e AS (
           SELECT event_id, user_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         l AS (
           SELECT *,
             lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_sec
           FROM e),
         m AS (
           SELECT *,
             CAST(prev_sec IS NULL OR sec - prev_sec > 1800 AS BIGINT)
               AS new_sess
           FROM l),
         sx AS (
           SELECT *,
             sum(new_sess) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_idx
           FROM m)
       SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         count(*) AS n_events,
         CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec
       FROM sx GROUP BY user_id, session_idx""",

    // same anchor datediff, same md5 unit draw, same rational decay
    "q_recency_sample" ->
      """SELECT event_id,
           CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')
             AS BIGINT) AS age_days
         FROM events
         WHERE ts IS NOT NULL
           AND CAST(('0x' || substr(md5('fresh ' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0
               < CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
                   + CAST(date_diff('day', CAST(ts AS DATE),
                       DATE '2024-02-01') AS DOUBLE))""",

    "q_date_parts" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           count(*) AS n, round(sum(o_totalprice), 4) AS total
         FROM orders GROUP BY 1, 2""",

    "q_json_get" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           count(*) AS n
         FROM events GROUP BY 1""",

    "q_time_window" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
           count(*) AS n, round(sum(value), 4) AS total
         FROM events GROUP BY 1, 2""",

    "q_range_join" ->
      """SELECT o_orderstatus, count(*) AS n_fast_items
         FROM orders JOIN lineitem
           ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
         GROUP BY o_orderstatus""",

    "q_session_window" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked)
         SELECT min(ts) AS session_start, user_id,
           count(*) AS n_events, round(sum(value), 4) AS total
         FROM sess GROUP BY user_id, sid""",

    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, s.event_id AS signup_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND p.ts >= s.ts""",
  )
}
