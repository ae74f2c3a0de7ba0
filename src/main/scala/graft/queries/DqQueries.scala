package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Constraints
import graft.operators.Constraints._
import graft.sources.Tables

/** Data-quality constraint-audit queries ([EXT]): declarative check
  * lists over the REAL fixture tables (no synthesis — the audit is the
  * operator's production shape), one aggregation job each, exploded to
  * the long-form (check, metric, threshold, pass) report. Thresholds
  * are chosen so each list contains at least one failing check (the
  * report discriminates). DuckDB replays every conditional count, the
  * distinct count, and the integer micro-rate math.
  */
object DqQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ORACLED: fact-table audit — completeness, numeric ranges, value
    // sets, key distinctness. in_set(l_linestatus) is the planted fail
    // (~50% < 60%).
    "q_dq_lineitem" -> ((s, dir) =>
      Constraints.audit(t(s, dir, "lineitem"), Seq(
        Completeness("l_shipdate", 1000000L),
        InRange("l_quantity", 1.0, 50.0, 1000000L),
        InRange("l_discount", 0.0, 0.05, 500000L),
        InSet("l_returnflag", Seq("A", "N", "R"), 1000000L),
        InSet("l_linestatus", Seq("O"), 600000L),
        Distinctness(Seq("l_orderkey"), 200000L)))),

    // ORACLED: corpus audit — text completeness, language whitelist,
    // source-id pattern, char-count sanity, id uniqueness. The tight
    // in_range(n_chars,1,100) is the planted fail.
    "q_dq_documents" -> ((s, dir) =>
      Constraints.audit(t(s, dir, "documents"), Seq(
        Completeness("text", 1000000L),
        InSet("lang", Seq("en", "de", "fr", "es", "zh"), 1000000L),
        MatchesRegex("source", "^src[0-9]+$", 1000000L),
        InRange("n_chars", 1.0, 100000.0, 1000000L),
        InRange("n_chars", 1.0, 100.0, 900000L),
        Distinctness(Seq("doc_id"), 1000000L)))),
  )

  /** Child side with planted orphans: doc_id % 5 == 0 shifted out of the
    * embeddings key space.
    */
  private def shiftedDocs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    t(s, dir, "documents").select(
      when(col("doc_id") % 5 === 0, col("doc_id") + 500000L)
        .otherwise(col("doc_id")).as("doc_id"))
  }

  val refQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ORACLED: referential integrity over the real fixture relationships
    // plus one planted-orphan side (the report discriminates).
    "q_dq_refint" -> ((s, dir) =>
      Constraints.refIntegrity(t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey", "lineitem->orders")
        .unionAll(Constraints.refIntegrity(
          t(s, dir, "documents"), "doc_id",
          t(s, dir, "embeddings"), "vec_id", "documents->embeddings"))
        .unionAll(Constraints.refIntegrity(
          shiftedDocs(s, dir), "doc_id",
          t(s, dir, "embeddings"), "vec_id", "shifted->embeddings"))),
  )

  private def refSql(childSel: String, ckey: String, parent: String,
                     pkey: String, label: String): String =
    """(WITH pk AS (SELECT DISTINCT PKEY AS __pk FROM PARENT),
        ca AS (
          SELECT count(*) AS n_child,
            count(*) FILTER (c.CKEY IS NULL) AS n_null_key,
            count(*) FILTER (c.CKEY IS NOT NULL AND p.__pk IS NULL)
              AS n_orphans
          FROM CHILD c LEFT JOIN pk p ON c.CKEY = p.__pk),
        pa AS (
          SELECT count(*) AS n_parent,
            count(*) FILTER (c2.__ck IS NULL) AS n_unref
          FROM pk p LEFT JOIN
            (SELECT DISTINCT CKEY AS __ck FROM CHILD
             WHERE CKEY IS NOT NULL) c2
            ON p.__pk = c2.__ck)
        SELECT 'LBL' AS relation, n_child, n_null_key, n_orphans,
          CAST(floor(n_orphans * 1000000.0 / n_child) AS BIGINT)
            AS orphan_rate_micro,
          n_parent, n_unref AS n_unreferenced_parent,
          CAST(floor((n_parent - n_unref) * 1000000.0 / n_parent)
            AS BIGINT) AS coverage_micro
        FROM ca, pa)"""
      .replace("CHILD", childSel).replace("CKEY", ckey)
      .replace("PARENT", parent).replace("PKEY", pkey)
      .replace("LBL", label)

  val refOracles: Map[String, String] = Map(
    "q_dq_refint" -> (
      "SELECT * FROM " +
        refSql("lineitem", "l_orderkey", "orders", "o_orderkey",
          "lineitem->orders") +
        " UNION ALL SELECT * FROM " +
        refSql("documents", "doc_id", "embeddings", "vec_id",
          "documents->embeddings") +
        " UNION ALL SELECT * FROM " +
        refSql("""(SELECT CASE WHEN doc_id % 5 = 0 THEN doc_id + 500000
                   ELSE doc_id END AS doc_id FROM documents)""",
          "doc_id", "embeddings", "vec_id", "shifted->embeddings")),
  )

  val oracles: Map[String, String] = Map(

    "q_dq_lineitem" ->
      """WITH a AS (
           SELECT count(*) AS n,
             count(l_shipdate) AS c0,
             count(*) FILTER (l_quantity >= 1.0 AND l_quantity <= 50.0)
               AS c1,
             count(*) FILTER (l_discount >= 0.0
               AND l_discount <= CAST(0.05 AS DOUBLE)) AS c2,
             count(*) FILTER (l_returnflag IN ('A','N','R')) AS c3,
             count(*) FILTER (l_linestatus IN ('O')) AS c4,
             count(DISTINCT l_orderkey) AS c5
           FROM lineitem),
         checks(check_name, num_sel, threshold_micro) AS (VALUES
           ('completeness(l_shipdate)', 0, 1000000),
           ('in_range(l_quantity,1.0,50.0)', 1, 1000000),
           ('in_range(l_discount,0.0,0.05)', 2, 500000),
           ('in_set(l_returnflag)', 3, 1000000),
           ('in_set(l_linestatus)', 4, 600000),
           ('distinctness(l_orderkey)', 5, 200000))
         SELECT check_name AS "check",
           CAST(floor(CASE num_sel WHEN 0 THEN c0 WHEN 1 THEN c1
                       WHEN 2 THEN c2 WHEN 3 THEN c3 WHEN 4 THEN c4
                       ELSE c5 END * 1000000.0 / n) AS BIGINT)
             AS metric_micro,
           CAST(threshold_micro AS BIGINT) AS threshold_micro,
           floor(CASE num_sel WHEN 0 THEN c0 WHEN 1 THEN c1
                  WHEN 2 THEN c2 WHEN 3 THEN c3 WHEN 4 THEN c4
                  ELSE c5 END * 1000000.0 / n) >= threshold_micro AS pass
         FROM a, checks""",

    "q_dq_documents" ->
      """WITH a AS (
           SELECT count(*) AS n,
             count(text) AS c0,
             count(*) FILTER (lang IN ('en','de','fr','es','zh')) AS c1,
             count(*) FILTER (regexp_matches(source, '^src[0-9]+$'))
               AS c2,
             count(*) FILTER (n_chars >= 1.0 AND n_chars <= 100000.0)
               AS c3,
             count(*) FILTER (n_chars >= 1.0 AND n_chars <= 100.0) AS c4,
             count(DISTINCT doc_id) AS c5
           FROM documents),
         checks(check_name, num_sel, threshold_micro) AS (VALUES
           ('completeness(text)', 0, 1000000),
           ('in_set(lang)', 1, 1000000),
           ('matches_regex(source)', 2, 1000000),
           ('in_range(n_chars,1.0,100000.0)', 3, 1000000),
           ('in_range(n_chars,1.0,100.0)', 4, 900000),
           ('distinctness(doc_id)', 5, 1000000))
         SELECT check_name AS "check",
           CAST(floor(CASE num_sel WHEN 0 THEN c0 WHEN 1 THEN c1
                       WHEN 2 THEN c2 WHEN 3 THEN c3 WHEN 4 THEN c4
                       ELSE c5 END * 1000000.0 / n) AS BIGINT)
             AS metric_micro,
           CAST(threshold_micro AS BIGINT) AS threshold_micro,
           floor(CASE num_sel WHEN 0 THEN c0 WHEN 1 THEN c1
                  WHEN 2 THEN c2 WHEN 3 THEN c3 WHEN 4 THEN c4
                  ELSE c5 END * 1000000.0 / n) >= threshold_micro AS pass
         FROM a, checks""",
  )
}
