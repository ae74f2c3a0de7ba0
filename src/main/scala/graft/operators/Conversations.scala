package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversation / SFT-data QA ([EXT]): the structural checks an
  * instruction-tuning pipeline runs before chat data reaches a template
  * — turn counts per role, alternation validation, empty-turn detection,
  * and deterministic template rendering. The conversation column is
  * `array<struct<role:string, content:string>>`, the common chat-data
  * shape.
  *
  * All pure Column expressions (size/filter/exists/aggregate/zip_with)
  * — zero shuffles, zero UDFs; at 100 TB this is a narrow scan-side
  * pass like the text quality gates. HOF lambdas evaluate interpreted,
  * which is acceptable here: per-turn work is a few string ops (the
  * expensive-probe-inside-HOF trap does not apply).
  */
object Conversations {

  /** Roles the alternation contract recognizes. */
  val UserRole = "user"
  val AssistantRole = "assistant"
  val SystemRole = "system"

  private def roles(conv: Column): Column =
    transform(conv, t => t.getField("role"))

  /** The conversation body after an optional leading system turn. */
  private def body(conv: Column): Column = {
    val r = roles(conv)
    when(size(conv) > 0 && element_at(r, 1) === SystemRole,
      slice(conv, lit(2), greatest(size(conv) - 1, lit(0))))
      .otherwise(conv)
  }

  /** The alternation contract as a pure Column (see [[turnStats]]). */
  def alternationOk(conv: Column): Column = {
    val b = body(conv)
    val bRoles = transform(b, t => t.getField("role"))
    val known = forall(bRoles,
      r => r === UserRole || r === AssistantRole)
    val startsUser = size(b) > 0 && element_at(bRoles, 1) === UserRole
    val adjacentDiffer = forall(
      zip_with(
        slice(bRoles, lit(1), greatest(size(bRoles) - 1, lit(0))),
        slice(bRoles, lit(2), greatest(size(bRoles) - 1, lit(0))),
        (a, c) => a =!= c),
      ok => ok)
    known && startsUser && adjacentDiffer
  }

  /** Any zero-length turn content, as a pure Column. */
  def hasEmptyTurn(conv: Column): Column =
    exists(conv, t => length(t.getField("content")) === 0)

  /** Inclusive running sums of a bigint array, as a pure Column:
    * `[a, a+b, a+c+b, …]` — an `aggregate` array accumulator (O(n²)
    * array builds; conversation-turn n, not corpus n).
    */
  private def runningSums(arr: Column): Column =
    aggregate(arr,
      struct(lit(0L).as("s"), array().cast("array<bigint>").as("a")),
      (acc, x) => struct(
        (acc.getField("s") + x).as("s"),
        concat(acc.getField("a"), array(acc.getField("s") + x)).as("a")),
      acc => acc.getField("a"))

  /** Loss-mask spans for assistant-only training: for each ASSISTANT
    * turn, the half-open character range `[start, end)` its content
    * occupies inside [[renderTemplate]]'s rendered string (0-based).
    * Element i of the render starts at `sum(lens of 0..i-1) + i`
    * (newline separators); its content starts `4 + len(role)` further
    * (the `<\|role\|>` tag). Output: `array<struct<turn_idx:int,
    * start:bigint, end:bigint>>` in turn order — explode + substring is
    * the mask a trainer consumes. Pure array expressions, no shuffle.
    */
  def assistantSpans(conv: Column): Column = {
    val lens = transform(conv, t =>
      (lit(4L) + length(t.getField("role")) +
        length(t.getField("content"))).cast("long"))
    val cums = runningSums(lens)
    val indexed = transform(conv, (t, i) => {
      val elemStart = when(i === 0, lit(0L))
        .otherwise(element_at(cums, i) + i.cast("long"))
      val contentStart = elemStart + lit(4L) +
        length(t.getField("role")).cast("long")
      struct(
        i.cast("int").as("turn_idx"),
        t.getField("role").as("role"),
        contentStart.as("start"),
        (contentStart + length(t.getField("content")).cast("long"))
          .as("end"))
    })
    transform(
      filter(indexed, s => s.getField("role") === AssistantRole),
      s => struct(s.getField("turn_idx").as("turn_idx"),
        s.getField("start").as("start"), s.getField("end").as("end")))
  }

  /** Per-conversation structural stats + validity flags:
    *
    *  - `n_turns` / `n_user` / `n_assistant` / `n_system`
    *  - `total_chars` / `assistant_chars` (exact integer sums)
    *  - `has_empty_turn`: any zero-length content
    *  - `alternation_ok`: after an optional LEADING system turn, roles
    *    are exactly user/assistant alternating and start with user (the
    *    standard chat-template precondition); a system turn anywhere
    *    else, adjacent same-role turns, or an unknown role fails it.
    *    Empty conversations fail (nothing to train on).
    *
    * Output: the id column plus the stats — narrow, shuffle-free.
    */
  def turnStats(df: DataFrame, idCol: String, convCol: String): DataFrame = {
    val conv = col(convCol)
    df.select(
      col(idCol),
      size(conv).cast("long").as("n_turns"),
      size(filter(conv, t => t.getField("role") === UserRole))
        .cast("long").as("n_user"),
      size(filter(conv, t => t.getField("role") === AssistantRole))
        .cast("long").as("n_assistant"),
      size(filter(conv, t => t.getField("role") === SystemRole))
        .cast("long").as("n_system"),
      aggregate(conv, lit(0L),
        (acc, t) => acc + length(t.getField("content")).cast("long"))
        .as("total_chars"),
      aggregate(filter(conv, t => t.getField("role") === AssistantRole),
        lit(0L),
        (acc, t) => acc + length(t.getField("content")).cast("long"))
        .as("assistant_chars"),
      hasEmptyTurn(conv).as("has_empty_turn"),
      alternationOk(conv).as("alternation_ok"))
  }

  /** Deterministic chat-template render: `<|role|>content` per turn,
    * newline-joined — the canonical-string form a tokenizer consumes and
    * the dedup key for conversation-level exact dedup. Pure
    * `aggregate` concat, byte-deterministic on any engine.
    */
  def renderTemplate(conv: Column): Column =
    array_join(
      transform(conv, t =>
        concat(lit("<|"), t.getField("role"), lit("|>"),
          t.getField("content"))),
      "\n")

  /** Keep only conversations a template can consume: alternation holds
    * and no turn is empty. A pure per-row filter — no join, no shuffle,
    * the flags evaluate inline on the scan.
    */
  def validConversations(df: DataFrame, convCol: String): DataFrame =
    df.filter(alternationOk(col(convCol)) && !hasEmptyTurn(col(convCol)))

  /** Context-window truncation — the standard chat policy: keep a
    * leading system turn unconditionally (even over budget), charge its
    * chars against the budget, then keep the LONGEST SUFFIX of the
    * remaining turns whose total content chars fit what is left (most
    * recent context wins). Pure array expressions: suffix running sums
    * via an `aggregate` array accumulator (O(turns²) array builds —
    * turns are tens, not thousands), suffix length = count of sums
    * within budget (sums are monotone), then two slices. No shuffle.
    */
  def truncateToBudget(conv: Column, budgetChars: Long): Column = {
    val hasSys = size(conv) > 0 &&
      element_at(conv, 1).getField("role") === SystemRole
    val bodyArr = when(hasSys,
      slice(conv, lit(2), greatest(size(conv) - 1, lit(0))))
      .otherwise(conv)
    val sysChars = when(hasSys,
      length(element_at(conv, 1).getField("content")).cast("long"))
      .otherwise(lit(0L))
    val rem = lit(budgetChars) - sysChars
    val revLens = reverse(transform(bodyArr,
      t => length(t.getField("content")).cast("long")))
    val sums = runningSums(revLens)
    val k = size(filter(sums, c => c <= rem))
    concat(
      slice(conv, lit(1), when(hasSys, lit(1)).otherwise(lit(0))),
      slice(bodyArr, size(bodyArr) - k + 1, k))
  }
}
