package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Profiling
import graft.operators.Profiling.Spec
import graft.sources.Tables

/** Column-profiling and snapshot-drift queries ([EXT]): the documents
  * table profiled as-is, and drift against a synthesized next snapshot
  * with planted upstream regressions — 10% of rows dropped
  * (doc_id % 10 == 3), text nulled for doc_id % 7 == 0 (a provider
  * starts sending nulls), n_chars inflated by 50 for doc_id % 5 == 0
  * (a scraper change). Tolerance 5% (50000 micro): the text null-rate
  * and distinct-count drops alarm, the small avg shifts do not.
  */
object ProfilingQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  private val spec = Spec(
    numeric = Seq("doc_id", "n_chars"),
    strings = Seq("text", "lang", "source"))

  private def nextSnap(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"),
        when(col("doc_id") % 5 === 0, col("n_chars") + 50L)
          .otherwise(col("n_chars")).as("n_chars"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ORACLED: one-job long-form profile of the real documents table.
    "q_dq_profile" -> ((s, dir) =>
      Profiling.profile(t(s, dir, "documents"), spec)),

    // ORACLED: metric drift between the current snapshot and the
    // planted-regression next snapshot, 5% tolerance.
    "q_dq_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Profiling.drift(
        Profiling.profile(docs, spec),
        Profiling.profile(nextSnap(docs), spec),
        tolMicro = 50000L)
    }),

    // ORACLED: per-bin PSI of n_chars between the snapshot and the
    // planted-regression next snapshot (thresholds fitted on the
    // baseline via the deterministic md5 sample).
    "q_dq_psi" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Profiling.psi(docs, nextSnap(docs), "n_chars", "doc_id")
    }),

    // ORACLED: join-skew diagnosis for the documents lang self-join —
    // the per-key contribution report that names the keys needing
    // salting before the join is paid for.
    "q_join_skew" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Profiling.joinSkewReport(docs, "lang", docs, "lang", topK = 5)
    }),
  )

  /** Long-form profile SQL over a relation named `rel` (must provide
    * doc_id, n_chars, text, lang, source). Mirrors Profiling.profile's
    * metric formulas exactly.
    */
  private def profileSql(rel: String): String =
    """(WITH a AS (
         SELECT count(*) AS n,
           count(doc_id) AS c_id, CAST(min(doc_id) AS DOUBLE) AS min_id,
           CAST(max(doc_id) AS DOUBLE) AS max_id,
           round(CAST(sum(doc_id) AS DOUBLE) / count(doc_id), 6) AS avg_id,
           count(n_chars) AS c_nc, CAST(min(n_chars) AS DOUBLE) AS min_nc,
           CAST(max(n_chars) AS DOUBLE) AS max_nc,
           round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 6)
             AS avg_nc,
           count(text) AS c_tx,
           round(CAST(sum(length(text)) AS DOUBLE) / count(text), 6)
             AS len_tx,
           CAST(count(DISTINCT text) AS DOUBLE) AS d_tx,
           count(lang) AS c_lg,
           round(CAST(sum(length(lang)) AS DOUBLE) / count(lang), 6)
             AS len_lg,
           CAST(count(DISTINCT lang) AS DOUBLE) AS d_lg,
           count(source) AS c_sr,
           round(CAST(sum(length(source)) AS DOUBLE) / count(source), 6)
             AS len_sr,
           CAST(count(DISTINCT source) AS DOUBLE) AS d_sr
         FROM REL)
       SELECT 'doc_id' AS "column", 'null_rate_micro' AS metric,
         CAST(floor((n - c_id) * 1000000.0 / n) AS DOUBLE) AS value FROM a
       UNION ALL SELECT 'doc_id', 'min', min_id FROM a
       UNION ALL SELECT 'doc_id', 'max', max_id FROM a
       UNION ALL SELECT 'doc_id', 'avg', avg_id FROM a
       UNION ALL SELECT 'n_chars', 'null_rate_micro',
         CAST(floor((n - c_nc) * 1000000.0 / n) AS DOUBLE) FROM a
       UNION ALL SELECT 'n_chars', 'min', min_nc FROM a
       UNION ALL SELECT 'n_chars', 'max', max_nc FROM a
       UNION ALL SELECT 'n_chars', 'avg', avg_nc FROM a
       UNION ALL SELECT 'text', 'null_rate_micro',
         CAST(floor((n - c_tx) * 1000000.0 / n) AS DOUBLE) FROM a
       UNION ALL SELECT 'text', 'avg_len', len_tx FROM a
       UNION ALL SELECT 'text', 'distinct', d_tx FROM a
       UNION ALL SELECT 'lang', 'null_rate_micro',
         CAST(floor((n - c_lg) * 1000000.0 / n) AS DOUBLE) FROM a
       UNION ALL SELECT 'lang', 'avg_len', len_lg FROM a
       UNION ALL SELECT 'lang', 'distinct', d_lg FROM a
       UNION ALL SELECT 'source', 'null_rate_micro',
         CAST(floor((n - c_sr) * 1000000.0 / n) AS DOUBLE) FROM a
       UNION ALL SELECT 'source', 'avg_len', len_sr FROM a
       UNION ALL SELECT 'source', 'distinct', d_sr FROM a)"""
      .replace("FROM REL", "FROM " + rel)

  private val nextSql =
    """(SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text,
         lang, source,
         CASE WHEN doc_id % 5 = 0 THEN n_chars + 50 ELSE n_chars END
           AS n_chars
       FROM documents WHERE doc_id % 10 <> 3)"""

  val oracles: Map[String, String] = Map(

    "q_dq_profile" -> ("SELECT * FROM " + profileSql("documents")),

    "q_dq_drift" -> ("""
       WITH prev AS (SELECT * FROM """ + profileSql("documents") + """),
       cur AS (SELECT * FROM """ + profileSql(nextSql) + """),
       j AS (
         SELECT prev."column" AS "column", prev.metric AS metric,
           prev.value AS prev_value, cur.value AS cur_value
         FROM prev JOIN cur
           ON cur."column" = prev."column" AND cur.metric = prev.metric),
       d AS (
         SELECT *,
           prev_value IS NOT NULL AND cur_value IS NOT NULL AS defined,
           CASE
             WHEN prev_value IS NULL OR cur_value IS NULL THEN 0
             WHEN prev_value = 0.0 AND cur_value = 0.0 THEN 0
             WHEN prev_value = 0.0 THEN
               CASE WHEN cur_value > 0.0 THEN 1000000 ELSE -1000000 END
             ELSE CAST(floor((cur_value - prev_value) * 1000000.0
                             / abs(prev_value)) AS BIGINT)
           END AS rel_change_micro
         FROM j)
       SELECT "column", metric, prev_value, cur_value,
         CAST(rel_change_micro AS BIGINT) AS rel_change_micro, defined,
         defined AND abs(rel_change_micro) > 50000 AS alarm
       FROM d"""),

    // PSI replay: the q_equidepth_approx threshold fit on the baseline,
    // both snapshots binned by literal-comparison counts, per-bin
    // (p-q)ln(p/q) with the 1e-6 rate floor.
    "q_dq_psi" -> ("""
       WITH s AS (
         SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
         ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 200),
       o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s),
       nn AS (SELECT count(*) AS n FROM s),
       cuts AS (
         SELECT (SELECT v FROM o
                 WHERE rn = ((SELECT n FROM nn) * d * 10 + 99) // 100)
           AS t
         FROM generate_series(1, 9) AS g(d)),
       nxt AS (SELECT n_chars FROM """ + nextSql + """),
       pb AS (
         SELECT 1 + (SELECT count(*) FROM cuts
                     WHERE t < CAST(n_chars AS DOUBLE)) AS bin
         FROM documents),
       cb AS (
         SELECT 1 + (SELECT count(*) FROM cuts
                     WHERE t < CAST(n_chars AS DOUBLE)) AS bin
         FROM nxt),
       pa AS (SELECT bin, count(*) AS n_prev FROM pb GROUP BY bin),
       ca AS (SELECT bin, count(*) AS n_cur FROM cb GROUP BY bin),
       j AS (
         SELECT coalesce(pa.bin, ca.bin) AS bin,
           coalesce(n_prev, 0) AS n_prev, coalesce(n_cur, 0) AS n_cur
         FROM pa FULL OUTER JOIN ca ON ca.bin = pa.bin),
       t AS (SELECT (SELECT count(*) FROM documents) AS tp,
                    (SELECT count(*) FROM nxt) AS tc),
       r AS (
         SELECT bin, n_prev, n_cur,
           greatest(CAST(n_prev AS DOUBLE) / tp, CAST(1e-6 AS DOUBLE))
             AS p,
           greatest(CAST(n_cur AS DOUBLE) / tc, CAST(1e-6 AS DOUBLE))
             AS q
         FROM j, t)
       SELECT bin, CAST(n_prev AS BIGINT) AS n_prev,
         CAST(n_cur AS BIGINT) AS n_cur,
         round((p - q) * ln(p / q), 6) AS psi_contrib
       FROM r"""),

    "q_join_skew" ->
      """WITH c AS (
           SELECT lang AS key, count(*) AS n
           FROM documents WHERE lang IS NOT NULL GROUP BY lang),
         m AS (
           SELECT l.key, l.n AS n_left, r.n AS n_right,
             l.n * r.n AS est_rows
           FROM c l JOIN c r ON r.key = l.key),
         t AS (SELECT sum(est_rows) AS te FROM m)
       SELECT key, n_left, n_right, CAST(est_rows AS BIGINT) AS est_rows,
         CAST(floor(CAST(est_rows AS DOUBLE) * 1000000 / te) AS BIGINT)
           AS share_micro
       FROM m, t
       ORDER BY est_rows DESC, key LIMIT 5""",
  )
}
