package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Preferences
import graft.sources.Tables

/** Preference-pair (RLHF/DPO) data-QA queries ([EXT]): (prompt, chosen,
  * rejected) triples synthesized in-plan from the documents fixture with
  * deterministic corruptions — byte-identical pairs for pid % 13 == 0,
  * empty chosen for pid % 17 == 0 (pid = doc_id % 97, so pair content
  * repeats across docs and the dedup/reuse queries have real groups) —
  * then the real pair-QA operators. DuckDB replays the token-synthesis
  * formulas with generate_series and re-derives flags, set overlap,
  * bias aggregates, and dedup groups, so a defect in any array
  * expression or aggregate hash-mismatches.
  */
object PrefQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Shared in-plan pair synthesis (see object scaladoc). Token arrays
    * are built at the max length (8) and sliced, so the empty-chosen
    * corruption never feeds `sequence` a negative span.
    */
  private def synthPairs(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val pid = id % 97
    val clen0 = (pid % 7 + 2).cast("int")
    val ident = pid % 13 === 0
    val rlen = when(ident, clen0).otherwise(((pid * 3) % 7 + 2).cast("int"))
    val strideR = when(ident, 3).otherwise(5)
    val clen = when(pid % 17 === 0, 0).otherwise(clen0)
    def toks(stride: Column, n: Column): Column = slice(
      transform(sequence(lit(0), lit(7)),
        i => concat(lit("t"), ((pid + i * stride) % 19).cast("string"))),
      lit(1), n)
    t(s, dir, "documents").select(
      id,
      concat(lit("p"), (id % 11).cast("string")).as("prompt"),
      concat(lit("s"), (id % 4).cast("string")).as("source"),
      toks(lit(3), clen).as("chosen_toks"),
      toks(strideR, rlen).as("rejected_toks"))
      .withColumn("chosen_str", array_join(col("chosen_toks"), " "))
      .withColumn("rejected_str", array_join(col("rejected_toks"), " "))
  }

  private def flagged(s: SparkSession, dir: String): DataFrame =
    Preferences.pairFlags(synthPairs(s, dir),
      col("chosen_str"), col("rejected_str"),
      col("chosen_toks"), col("rejected_toks"))

  /** The per-pair replay both oracles build on: token rows via
    * generate_series, strings via ordered string_agg, distinct-set
    * overlap via a join on (id, tok).
    */
  private val pairsCte =
    """WITH base AS (
         SELECT doc_id AS id, doc_id % 97 AS pid,
           'p' || (doc_id % 11) AS prompt,
           's' || (doc_id % 4) AS src,
           CASE WHEN doc_id % 97 % 17 = 0 THEN 0
                ELSE doc_id % 97 % 7 + 2 END AS clen,
           CASE WHEN doc_id % 97 % 13 = 0 THEN doc_id % 97 % 7 + 2
                ELSE (doc_id % 97 * 3) % 7 + 2 END AS rlen,
           CASE WHEN doc_id % 97 % 13 = 0 THEN 3 ELSE 5 END AS stride_r
         FROM documents),
       ctoks AS (
         SELECT id, i.i, 't' || ((pid + i.i*3) % 19) AS tok
         FROM base, generate_series(0, 7) i(i) WHERE i.i < clen),
       rtoks AS (
         SELECT id, i.i, 't' || ((pid + i.i*stride_r) % 19) AS tok
         FROM base, generate_series(0, 7) i(i) WHERE i.i < rlen),
       cstr AS (
         SELECT b.id,
           coalesce(string_agg(c.tok, ' ' ORDER BY c.i), '') AS chosen_str,
           count(c.tok) AS n_ctoks
         FROM base b LEFT JOIN ctoks c ON c.id = b.id GROUP BY b.id),
       rstr AS (
         SELECT b.id,
           coalesce(string_agg(r.tok, ' ' ORDER BY r.i), '') AS rejected_str,
           count(r.tok) AS n_rtoks
         FROM base b LEFT JOIN rtoks r ON r.id = b.id GROUP BY b.id),
       overlap AS (
         SELECT b.id,
           coalesce(o.n_inter, 0) AS n_inter,
           coalesce(cd.n, 0) + coalesce(rd.n, 0) - coalesce(o.n_inter, 0)
             AS n_union
         FROM base b
         LEFT JOIN (SELECT id, count(*) AS n
                    FROM (SELECT DISTINCT id, tok FROM ctoks) GROUP BY id)
           cd ON cd.id = b.id
         LEFT JOIN (SELECT id, count(*) AS n
                    FROM (SELECT DISTINCT id, tok FROM rtoks) GROUP BY id)
           rd ON rd.id = b.id
         LEFT JOIN (SELECT c.id, count(*) AS n_inter
                    FROM (SELECT DISTINCT id, tok FROM ctoks) c
                    JOIN (SELECT DISTINCT id, tok FROM rtoks) r
                      ON r.id = c.id AND r.tok = c.tok
                    GROUP BY c.id) o ON o.id = b.id),
       pairs AS (
         SELECT b.id, b.prompt, b.src,
           cstr.chosen_str, rstr.rejected_str,
           CAST(length(cstr.chosen_str) AS BIGINT) AS chosen_chars,
           CAST(length(rstr.rejected_str) AS BIGINT) AS rejected_chars,
           CAST(cstr.n_ctoks AS BIGINT) AS n_chosen_toks,
           CAST(rstr.n_rtoks AS BIGINT) AS n_rejected_toks,
           cstr.chosen_str = rstr.rejected_str AS identical,
           length(cstr.chosen_str) = 0 AS empty_chosen,
           length(rstr.rejected_str) = 0 AS empty_rejected,
           length(cstr.chosen_str) > length(rstr.rejected_str)
             AS chosen_longer,
           CASE WHEN o.n_union = 0 THEN 0
                ELSE CAST(floor(o.n_inter * 1000000.0 / o.n_union)
                          AS BIGINT) END AS tok_jaccard_micro,
           NOT (cstr.chosen_str = rstr.rejected_str)
             AND length(cstr.chosen_str) > 0
             AND length(rstr.rejected_str) > 0 AS valid
         FROM base b
         JOIN cstr ON cstr.id = b.id
         JOIN rstr ON rstr.id = b.id
         JOIN overlap o ON o.id = b.id)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ORACLED per-pair QA flags + token-set overlap (narrow scan-side
    // pass, zero exchanges — plan-gated).
    "q_pref_stats" -> ((s, dir) => {
      flagged(s, dir).select(
        col("doc_id"), col("chosen_chars"), col("rejected_chars"),
        col("n_chosen_toks"), col("n_rejected_toks"),
        col("identical"), col("empty_chosen"), col("empty_rejected"),
        col("chosen_longer"), col("tok_jaccard_micro"), col("valid"))
    }),

    // ORACLED per-source length-bias report (the chosen-longer win rate
    // a reward-model audit reads) — one hash aggregate.
    "q_pref_bias" -> ((s, dir) =>
      Preferences.lengthBiasReport(flagged(s, dir), "source")),

    // ORACLED exact pair dedup: distinct (prompt, chosen) groups with
    // copy counts and the kept (minimum) id.
    "q_pref_dedup" -> ((s, dir) =>
      Preferences.exactPairGroups(synthPairs(s, dir),
        "prompt", "chosen_str", "doc_id")),

    // ORACLED response-reuse audit: chosen responses winning under >1
    // distinct prompt (canned-answer smell).
    "q_pref_reuse" -> ((s, dir) =>
      Preferences.responseReuse(synthPairs(s, dir),
        "prompt", "chosen_str")),

    // ORACLED best-of-n selection: per prompt, n = doc_id % 3 + 2 scored
    // candidates collapse to the argmax + runner-up margin — the whole
    // rejection-sampling reduction is a narrow per-row array pass.
    "q_best_of_n" -> ((s, dir) => {
      val id = col("doc_id")
      val n = (id % 3 + 2).cast("int")
      val cands = filter(
        transform(sequence(lit(0), lit(3)), i => struct(
          ((id * 7 + i * 13) % 100).as("score"), i.as("cand"))),
        c => c.getField("cand") < n)
      t(s, dir, "documents").select(id,
          Preferences.bestOfN(cands).as("b"))
        .select(id, col("b.best_cand"), col("b.best_score"),
          col("b.margin"), col("b.n_cands"))
    }),

    // ORACLED curriculum shard layout: md5-uniform shard draw, rows
    // positioned easy-first (n_chars) within each shard with
    // deterministic tie-breaks — per-shard local sorts, no global sort.
    "q_curriculum_shards" -> ((s, dir) =>
      graft.operators.Sampling.curriculumOrder(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", nShards = 4)),
  )

  val oracles: Map[String, String] = Map(

    "q_pref_stats" -> (pairsCte + """
       SELECT id AS doc_id, chosen_chars, rejected_chars,
         n_chosen_toks, n_rejected_toks, identical, empty_chosen,
         empty_rejected, chosen_longer, tok_jaccard_micro, valid
       FROM pairs"""),

    "q_pref_bias" -> (pairsCte + """
       SELECT src AS source,
         count(*) AS n_pairs,
         CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
         CAST(sum(CASE WHEN identical THEN 1 ELSE 0 END) AS BIGINT)
           AS n_identical,
         CAST(sum(CASE WHEN empty_chosen THEN 1 ELSE 0 END) AS BIGINT)
           AS n_empty_chosen,
         round(sum(CASE WHEN chosen_longer AND valid THEN 1 ELSE 0 END)
           * 1.0 / sum(CASE WHEN valid THEN 1 ELSE 0 END), 6)
           AS frac_chosen_longer,
         round(sum(CASE WHEN valid THEN chosen_chars - rejected_chars
                        ELSE 0 END)
           * 1.0 / sum(CASE WHEN valid THEN 1 ELSE 0 END), 6)
           AS avg_char_diff,
         round(sum(CASE WHEN valid THEN tok_jaccard_micro ELSE 0 END)
           * 1.0 / sum(CASE WHEN valid THEN 1 ELSE 0 END) / 1e6, 6)
           AS avg_tok_jaccard
       FROM pairs GROUP BY src"""),

    "q_pref_dedup" -> (pairsCte + """
       SELECT prompt, chosen_str, count(*) AS n_copies,
         min(id) AS keeper_id
       FROM pairs GROUP BY prompt, chosen_str"""),

    "q_pref_reuse" -> (pairsCte + """
       SELECT chosen_str, count(DISTINCT prompt) AS n_prompts,
         count(*) AS n_pairs
       FROM pairs GROUP BY chosen_str HAVING count(DISTINCT prompt) > 1"""),

    "q_best_of_n" ->
      """WITH c AS (
           SELECT doc_id, CAST(i.i AS INTEGER) AS cand,
             (doc_id * 7 + i.i * 13) % 100 AS score
           FROM documents, generate_series(0, 3) i(i)
           WHERE i.i < doc_id % 3 + 2),
         r AS (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
           FROM c)
       SELECT a.doc_id, a.cand AS best_cand,
         CAST(a.score AS BIGINT) AS best_score,
         CAST(a.score - coalesce(b.score, a.score) AS BIGINT) AS margin,
         CAST(doc_id % 3 + 2 AS INTEGER) AS n_cands
       FROM (SELECT * FROM r WHERE rn = 1) a
       LEFT JOIN (SELECT doc_id AS id2, score FROM r WHERE rn = 2) b
         ON b.id2 = a.doc_id""",

    "q_curriculum_shards" ->
      """SELECT doc_id, n_chars,
           CAST(('0x' || substr(md5('shard ' || doc_id), 1, 8)) AS BIGINT)
             % 4 AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST(('0x' || substr(md5('shard ' || doc_id),
               1, 8)) AS BIGINT) % 4
             ORDER BY n_chars, md5('shard ' || doc_id), doc_id) AS BIGINT)
             AS position
         FROM documents""",
  )
}
