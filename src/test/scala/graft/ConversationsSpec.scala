package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Conversations

/** Conversation / SFT-data QA: structural stats, the alternation
  * contract's edge cases, template rendering, and the validity filter.
  */
class ConversationsSpec extends SparkSpec {
  import spark.implicits._

  private def conv(turns: (String, String)*) =
    turns.map { case (r, c) => (r, c) }

  private def frame(rows: (Long, Seq[(String, String)])*) =
    rows.toSeq.toDF("id", "conv")
      .withColumn("conv",
        transform(col("conv"), t =>
          struct(t.getField("_1").as("role"), t.getField("_2").as("content"))))

  test("turnStats: counts, sums, and flags across the contract's edges") {
    val df = frame(
      // valid: leading system, then user/assistant alternating
      1L -> conv("system" -> "be nice", "user" -> "hi", "assistant" -> "hello"),
      // valid: no system
      2L -> conv("user" -> "q", "assistant" -> "a", "user" -> "q2",
        "assistant" -> "a2"),
      // adjacent same-role: fails
      3L -> conv("user" -> "q", "user" -> "q again", "assistant" -> "a"),
      // system mid-conversation: unknown role in body, fails
      4L -> conv("user" -> "q", "system" -> "interject", "assistant" -> "a"),
      // starts with assistant: fails
      5L -> conv("assistant" -> "unprompted", "user" -> "ok"),
      // empty assistant turn: alternation holds, empty flag set
      6L -> conv("user" -> "q", "assistant" -> ""),
      // empty conversation: fails (nothing to train on)
      7L -> Seq.empty)
    val out = Conversations.turnStats(df, "id", "conv")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 3L) // n_turns
    assert(out(1L).getLong(2) === 1L && out(1L).getLong(3) === 1L &&
      out(1L).getLong(4) === 1L) // user/assistant/system
    assert(out(1L).getLong(5) === 14L) // "be nice"=7 + "hi"=2 + "hello"=5
    assert(out(2L).getBoolean(8) === true)
    assert(out(3L).getBoolean(8) === false)
    assert(out(4L).getBoolean(8) === false)
    assert(out(5L).getBoolean(8) === false)
    assert(out(6L).getBoolean(8) === true)
    assert(out(6L).getBoolean(7) === true) // has_empty_turn
    assert(out(7L).getBoolean(8) === false)
    assert(out(1L).getBoolean(7) === false)
  }

  test("renderTemplate: exact canonical string") {
    val df = frame(1L -> conv("system" -> "s", "user" -> "u",
      "assistant" -> "a"))
    val got = df.select(
      Conversations.renderTemplate(col("conv")).as("r"))
      .as[String].head()
    assert(got === "<|system|>s\n<|user|>u\n<|assistant|>a")
  }

  test("validConversations: pure filter keeps exactly the consumable rows") {
    val df = frame(
      1L -> conv("user" -> "q", "assistant" -> "a"),
      2L -> conv("user" -> "q", "user" -> "q2"),
      3L -> conv("user" -> "q", "assistant" -> ""))
    val kept = Conversations.validConversations(df, "conv")
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L))
  }

  test("truncateToBudget: system survives, most recent turns win") {
    def run(budget: Long, turns: (String, String)*): Seq[(String, String)] = {
      val df = frame(1L -> conv(turns: _*))
      df.select(Conversations.truncateToBudget(col("conv"), budget).as("k"))
        .select(explode(col("k")).as("t"))
        .select(col("t.role"), col("t.content"))
        .as[(String, String)].collect().toSeq
    }
    // budget 5 after system's 3: keeps only the last turn (2+2 > 5-3=2? no:
    // suffix sums from end: "d"=1 fits, "ccc"+1=4 > 2 stops)
    val got = run(5L, "system" -> "sss", "user" -> "bb", "assistant" -> "ccc",
      "user" -> "d")
    assert(got === Seq("system" -> "sss", "user" -> "d"))
    // system alone exceeds the budget: still kept, body all dropped
    assert(run(2L, "system" -> "sssss", "user" -> "aa") ===
      Seq("system" -> "sssss"))
    // no system: plain suffix under budget
    assert(run(3L, "user" -> "aa", "assistant" -> "bb", "user" -> "c") ===
      Seq("assistant" -> "bb", "user" -> "c"))
    // everything fits: unchanged
    assert(run(100L, "user" -> "aa", "assistant" -> "bb") ===
      Seq("user" -> "aa", "assistant" -> "bb"))
    // nothing fits, no system: empty
    assert(run(0L, "user" -> "aa") === Seq.empty)
  }

  test("assistantSpans: offsets cut exactly the assistant content") {
    val df = frame(
      1L -> conv("system" -> "be nice", "user" -> "hi there",
        "assistant" -> "hello!", "user" -> "more?", "assistant" -> "yes"),
      2L -> conv("user" -> "q"), // no assistant turns: empty spans
      3L -> Seq.empty)
    val out = df.select(col("id"),
      Conversations.renderTemplate(col("conv")).as("rendered"),
      Conversations.assistantSpans(col("conv")).as("spans"))
      .collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val rendered = byId(1L).getString(1)
    val spans = byId(1L).getSeq[Row](2)
    assert(spans.map(_.getInt(0)) === Seq(2, 4))
    // every span substring is exactly that turn's content
    val expect = Map(2 -> "hello!", 4 -> "yes")
    spans.foreach { s =>
      val (idx, st, en) = (s.getInt(0), s.getLong(1), s.getLong(2))
      assert(rendered.substring(st.toInt, en.toInt) === expect(idx),
        s"span $idx [$st,$en) in '$rendered'")
    }
    assert(byId(2L).getSeq[Row](2).isEmpty)
    assert(byId(3L).getSeq[Row](2).isEmpty)
  }
}
