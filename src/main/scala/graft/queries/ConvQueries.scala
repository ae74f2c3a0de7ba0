package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Conversations
import graft.sources.Tables

/** Conversation / SFT-data QA queries ([EXT]): chat-shaped
  * `array<struct<role,content>>` columns synthesized in-plan from the
  * documents fixture (with deterministic corruption — double-role turns
  * for doc_id % 7 == 0, an empty assistant turn for doc_id % 11 == 0 —
  * so every flag discriminates), then the real array-expression
  * operators. DuckDB replays the per-turn synthesis formulas row-wise
  * and re-aggregates, so a defect in any HOF (filter/aggregate/
  * zip_with/slice) hash-mismatches.
  */
object ConvQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Shared in-plan conversation synthesis (see object scaladoc).
    * Corruption precedence (last turn forced 'user') is deliberately
    * applied OVER the system rule on both engines.
    */
  private def synthConv: Column = {
    val id = col("doc_id")
    val n = (id % 5 + 2).cast("int")
    val sys = id % 3 === 0
    transform(sequence(lit(0), n - 1), i => {
      val off = when(sys, 1).otherwise(0)
      val role = when(id % 7 === 0 && i === n - 1, lit("user"))
        .when(i === 0 && sys, lit("system"))
        .when(((i - off) % 2) === 0, lit("user"))
        .otherwise(lit("assistant"))
      val len = when(id % 11 === 0 && i === 1, lit(0))
        .otherwise(((id + i * 3) % 8 + 1).cast("int"))
      struct(role.as("role"),
        call_function("repeat", lit("x"), len).as("content"))
    })
  }

  /** The per-turn replay both oracles build on. */
  private val turnsCte =
    """WITH ids AS (
         SELECT doc_id AS id, CAST(doc_id % 5 + 2 AS INTEGER) AS n,
           doc_id % 3 = 0 AS sys
         FROM documents),
       turns AS (
         SELECT id, n, sys, i.i,
           CASE WHEN id % 7 = 0 AND i.i = n - 1 THEN 'user'
                WHEN i.i = 0 AND sys THEN 'system'
                WHEN (i.i - CASE WHEN sys THEN 1 ELSE 0 END) % 2 = 0
                  THEN 'user'
                ELSE 'assistant' END AS role,
           CASE WHEN id % 11 = 0 AND i.i = 1 THEN 0
                ELSE CAST((id + i.i*3) % 8 + 1 AS INTEGER) END AS len
         FROM ids, generate_series(0, 6) i(i) WHERE i.i < n)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ORACLED turn stats + validity flags over the synthesized chat data.
    "q_conv_stats" -> ((s, dir) => {
      Conversations.turnStats(
        t(s, dir, "documents").select(col("doc_id"),
          synthConv.as("conv")),
        "doc_id", "conv")
    }),

    // ORACLED template render: the canonical string a tokenizer consumes
    // — byte-compared cross-engine, plus its length.
    "q_conv_render" -> ((s, dir) => {
      val conv = synthConv
      t(s, dir, "documents").select(
        col("doc_id"),
        Conversations.renderTemplate(conv).as("rendered"))
        .withColumn("n_chars", length(col("rendered")).cast("long"))
    }),

    // ORACLED context-window truncation: budget 20 chars bites on most
    // fixture conversations (totals run up to ~40), the system turn
    // survives unconditionally, and the kept suffix renders byte-
    // identically cross-engine.
    "q_conv_truncate" -> ((s, dir) => {
      val kept = Conversations.truncateToBudget(synthConv, 20L)
      t(s, dir, "documents").select(
        col("doc_id"),
        size(kept).cast("long").as("n_kept"),
        Conversations.renderTemplate(kept).as("rendered"))
    }),

    // ORACLED assistant loss-mask spans: the [start, end) character
    // ranges assistant content occupies in the rendered string — the
    // mask a trainer consumes. DuckDB replays element offsets with a
    // prefix-sum window.
    "q_conv_spans" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        explode(Conversations.assistantSpans(synthConv)).as("s"))
        .select(col("doc_id"), col("s.turn_idx"),
          col("s.start"), col("s.end"))
    }),

    // ORACLED instruction verb-object diversity histogram (the
    // Self-Instruct report): prompts synthesized from verb/noun lookup
    // tables (with an object-less corruption for doc_id % 13 == 0), the
    // REAL extraction path (tokens kernel + stopword-skipping object
    // pick) runs over the rendered strings, then one hash agg + a
    // broadcast total for the share column.
    "q_instr_diversity" -> ((s, dir) => {
      import graft.operators.TextAnalysis
      val id = col("doc_id")
      val verbs = array(Seq("write", "explain", "summarize", "translate",
        "list", "compare", "rewrite", "draft").map(lit): _*)
      val nouns = array(Seq("poem", "report", "email", "story", "recipe",
        "essay", "speech", "letter", "review", "haiku", "memo")
        .map(lit): _*)
      val v = element_at(verbs, (id % 8 + 1).cast("int"))
      val noun = element_at(nouns, ((id * 3) % 11 + 1).cast("int"))
      val cap = concat(upper(substring(v, 1, 1)), substring(v, 2, 20))
      val prompt = when(id % 13 === 0, concat(cap, lit(" it")))
        .otherwise(concat(cap, lit(" the "), noun, lit(" now")))
      val df = t(s, dir, "documents").select(id, prompt.as("prompt"))
      val vo = TextAnalysis.verbObject(col("prompt"))
      // every prompt lands in exactly one (verb, obj) group, so the
      // total is the sum of the group counts — localCheckpoint the tiny
      // histogram so the share column does not rescan documents
      val grouped = df
        .select(vo.getField("verb").as("verb"), vo.getField("obj").as("obj"))
        .groupBy(col("verb"), col("obj"))
        .agg(count(lit(1)).as("n_prompts"))
        .localCheckpoint()
      grouped.crossJoin(broadcast(
        grouped.agg(sum(col("n_prompts")).as("__t"))))
        .select(col("verb"), col("obj"), col("n_prompts"),
          floor(col("n_prompts").cast("long") * 1000000L / col("__t"))
            .cast("long").as("share_micro"))
    }),
  )

  val oracles: Map[String, String] = Map(

    // Stats replay: per-turn rows, body = turns after a leading system
    // turn, alternation via lag() over body order.
    "q_conv_stats" -> (turnsCte + """,
       body AS (
         SELECT * FROM turns WHERE NOT (i = 0 AND role = 'system')),
       alt AS (
         SELECT id,
           bool_and(role IN ('user','assistant')) AS known,
           arg_min(role, i) = 'user' AS starts_user,
           bool_and(prev IS NULL OR role <> prev) AS adjacent_differ
         FROM (SELECT id, i, role,
                 lag(role) OVER (PARTITION BY id ORDER BY i) AS prev
               FROM body)
         GROUP BY id),
       agg AS (
         SELECT id,
           count(*) AS n_turns,
           count(*) FILTER (role = 'user') AS n_user,
           count(*) FILTER (role = 'assistant') AS n_assistant,
           count(*) FILTER (role = 'system') AS n_system,
           CAST(sum(len) AS BIGINT) AS total_chars,
           CAST(coalesce(sum(len) FILTER (role = 'assistant'), 0)
             AS BIGINT) AS assistant_chars,
           bool_or(len = 0) AS has_empty_turn
         FROM turns GROUP BY id)
       SELECT agg.id AS doc_id, n_turns, n_user, n_assistant, n_system,
         total_chars, assistant_chars, has_empty_turn,
         (known AND starts_user AND adjacent_differ) AS alternation_ok
       FROM agg JOIN alt ON alt.id = agg.id"""),

    // Render replay: string_agg in turn order with the exact
    // '<|role|>content' element form and newline separator.
    "q_conv_render" -> (turnsCte + """
       SELECT id AS doc_id,
         string_agg('<|' || role || '|>' || repeat('x', len),
           chr(10) ORDER BY i) AS rendered,
         CAST(sum(4 + length(role) + len) + count(*) - 1 AS BIGINT)
           AS n_chars
       FROM turns GROUP BY id"""),

    // Truncation replay: suffix running sums over the non-system turns
    // (window ORDER BY i DESC), kept = system turn OR suffix sum within
    // the system-charged budget; LEFT JOIN keeps ids whose kept set is
    // empty (rendered = '' like Spark's array_join of an empty array).
    "q_conv_truncate" -> (turnsCte + """,
       marked AS (
         SELECT *, (i = 0 AND role = 'system') AS is_sys FROM turns),
       sysc AS (
         SELECT id,
           CAST(coalesce(sum(len) FILTER (is_sys), 0) AS BIGINT)
             AS sys_chars
         FROM marked GROUP BY id),
       suff AS (
         SELECT m.*,
           sum(CASE WHEN is_sys THEN 0 ELSE len END)
             OVER (PARTITION BY id ORDER BY i DESC) AS scum
         FROM marked m),
       kept AS (
         SELECT s.id, s.i, s.role, s.len
         FROM suff s JOIN sysc c ON c.id = s.id
         WHERE s.is_sys OR s.scum <= 20 - c.sys_chars),
       agg AS (
         SELECT id, count(*) AS n_kept,
           string_agg('<|' || role || '|>' || repeat('x', len),
             chr(10) ORDER BY i) AS rendered
         FROM kept GROUP BY id)
       SELECT ids.id AS doc_id,
         coalesce(agg.n_kept, 0) AS n_kept,
         coalesce(agg.rendered, '') AS rendered
       FROM ids LEFT JOIN agg ON agg.id = ids.id"""),

    // Span replay: rendered-element offsets via a prefix-sum window
    // (+i for the newline separators), assistant rows only.
    "q_conv_spans" -> (turnsCte + """,
       pos AS (
         SELECT id, i, role, len,
           coalesce(sum(4 + length(role) + len)
             OVER (PARTITION BY id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + i AS elem_start
         FROM turns)
       SELECT id AS doc_id, CAST(i AS INTEGER) AS turn_idx,
         CAST(elem_start + 4 + length(role) AS BIGINT) AS start,
         CAST(elem_start + 4 + length(role) + len AS BIGINT) AS "end"
       FROM pos WHERE role = 'assistant'"""),

    // Diversity replay: the same verb/noun lookups and capitalized
    // rendering, then the extraction re-derived from the STRING (split,
    // lower, stopword-skipping object pick) — a tokens-kernel or
    // HOF defect hash-mismatches.
    "q_instr_diversity" ->
      """WITH p AS (
           SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN cap || ' it'
                  ELSE cap || ' the ' || nn || ' now' END AS prompt
           FROM (
             SELECT doc_id,
               upper(left(v, 1)) || substr(v, 2) AS cap, nn
             FROM (
               SELECT doc_id,
                 (['write','explain','summarize','translate','list',
                   'compare','rewrite','draft'])[CAST(doc_id % 8 + 1
                     AS INTEGER)] AS v,
                 (['poem','report','email','story','recipe','essay',
                   'speech','letter','review','haiku','memo'])
                   [CAST((doc_id * 3) % 11 + 1 AS INTEGER)] AS nn
               FROM documents))),
         vo AS (
           SELECT doc_id, parts[1] AS verb,
             coalesce(list_filter(parts[2:], x -> NOT list_contains(['the','a','an','it','this','that','my','your','of'], x))[1], '') AS obj
           FROM (SELECT doc_id, string_split(lower(prompt), ' ') AS parts
                 FROM p))
       SELECT verb, obj, count(*) AS n_prompts,
         CAST(floor(count(*) * 1000000.0 /
           (SELECT count(*) FROM p)) AS BIGINT) AS share_micro
       FROM vo GROUP BY verb, obj""",
  )
}
