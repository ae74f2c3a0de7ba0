package graft

import org.apache.spark.sql.functions._

import graft.operators.Preferences

/** Preference-pair QA: validity flags, token-set overlap, the
  * length-bias report, and pair dedup / response reuse.
  */
class PreferencesSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    // id, prompt, source, chosen, rejected
    (1L, "p1", "s0", "a b c", "a b"),       // valid, chosen longer
    (2L, "p1", "s0", "x", "x"),             // identical -> invalid
    (3L, "p2", "s0", "", "y z"),            // empty chosen -> invalid
    (4L, "p2", "s1", "m n", "m n o p"),     // valid, rejected longer
    (5L, "p3", "s1", "a b c", "d e f"),     // valid, disjoint tokens
    (6L, "p4", "s1", "a b c", "q")          // same chosen as id=1, new prompt
  ).toDF("id", "prompt", "source", "chosen_str", "rejected_str")
    .withColumn("chosen_toks", split(col("chosen_str"), " "))
    .withColumn("rejected_toks", split(col("rejected_str"), " "))

  private def flagged = Preferences.pairFlags(pairs,
    col("chosen_str"), col("rejected_str"),
    col("chosen_toks"), col("rejected_toks"))

  test("pairFlags: identity, emptiness, length, overlap") {
    val out = flagged.collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Boolean]("valid"))
    assert(out(1L).getAs[Boolean]("chosen_longer"))
    // {a,b,c} vs {a,b}: inter 2, union 3 -> floor(2e6/3)
    assert(out(1L).getAs[Long]("tok_jaccard_micro") === 666666L)
    assert(out(2L).getAs[Boolean]("identical"))
    assert(!out(2L).getAs[Boolean]("valid"))
    assert(out(2L).getAs[Long]("tok_jaccard_micro") === 1000000L)
    assert(out(3L).getAs[Boolean]("empty_chosen"))
    assert(!out(3L).getAs[Boolean]("valid"))
    assert(out(4L).getAs[Boolean]("valid"))
    assert(!out(4L).getAs[Boolean]("chosen_longer"))
    assert(out(5L).getAs[Long]("tok_jaccard_micro") === 0L)
    assert(out(5L).getAs[Long]("n_chosen_toks") === 3L)
    assert(out(1L).getAs[Long]("chosen_chars") === 5L)
  }

  test("lengthBiasReport: per-source win rate over valid pairs only") {
    val out = Preferences.lengthBiasReport(flagged, "source").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // s0: ids 1,2,3 -> 1 valid (id=1), chosen longer
    assert(out("s0").getAs[Long]("n_pairs") === 3L)
    assert(out("s0").getAs[Long]("n_valid") === 1L)
    assert(out("s0").getAs[Long]("n_identical") === 1L)
    assert(out("s0").getAs[Long]("n_empty_chosen") === 1L)
    assert(out("s0").getAs[Double]("frac_chosen_longer") === 1.0)
    // s1: ids 4,5,6 all valid; chosen longer for 5 ("a b c" vs "d e f"
    // is equal length -> false) and 6 -> 1 of 3
    assert(out("s1").getAs[Long]("n_valid") === 3L)
    assert(out("s1").getAs[Double]("frac_chosen_longer")
      === math.round(1.0 / 3.0 * 1e6) / 1e6)
    // avg_char_diff s0: (5-3)/1 = 2
    assert(out("s0").getAs[Double]("avg_char_diff") === 2.0)
  }

  test("bestOfN: argmax, tie-break, margin, singleton") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq((5L, 0), (9L, 1), (7L, 2))),  // best cand 1, margin 2
      (2L, Seq((4L, 2), (4L, 1))),           // tie -> lower cand wins
      (3L, Seq((8L, 0)))                     // singleton -> margin 0
    ).toDF("id", "raw")
      .withColumn("cands", transform(col("raw"), c =>
        struct(c.getField("_1").as("score"), c.getField("_2").as("cand"))))
    val out = df.select(col("id"),
        graft.operators.Preferences.bestOfN(col("cands")).as("b"))
      .select(col("id"), col("b.best_cand"), col("b.best_score"),
        col("b.margin"), col("b.n_cands"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) === 1 && out(1L).getLong(2) === 9L &&
      out(1L).getLong(3) === 2L && out(1L).getInt(4) === 3)
    assert(out(2L).getInt(1) === 1 && out(2L).getLong(3) === 0L)
    assert(out(3L).getInt(1) === 0 && out(3L).getLong(3) === 0L &&
      out(3L).getInt(4) === 1)
  }

  test("curriculumOrder: easy-first positions, contiguous per shard, layout-stable") {
    import org.apache.spark.sql.functions._
    val df = (1L to 100L).map(i => (i, (i * 37) % 19)).toDF("id", "diff")
    val out = graft.operators.Sampling.curriculumOrder(df, "id", "diff", 4)
    val rows = out.collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(1), r.getLong(0)))
    // contiguous 1..k positions per shard
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq)
      // difficulty non-decreasing along positions
      val byPos = rs.sortBy(_._2).map(_._3)
      assert(byPos.zip(byPos.drop(1)).forall { case (a, b) => a <= b })
    }
    // deterministic under a different input layout
    val out2 = graft.operators.Sampling.curriculumOrder(
      df.repartition(7, col("diff")), "id", "diff", 4)
    assert(out2.collect().map(r => (r.getLong(0), r.getLong(2),
      r.getLong(3))).toSet ===
      rows.map(t => (t._4, t._1, t._2)).toSet)
  }

  test("exactPairGroups and responseReuse") {
    val groups = Preferences.exactPairGroups(pairs,
      "prompt", "chosen_str", "id").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // six distinct (prompt, chosen) pairs here, all n_copies=1
    assert(groups.size === 6)
    assert(groups(("p1", "a b c")).getAs[Long]("n_copies") === 1L)
    // add a literal duplicate and re-group
    val withDup = pairs.union(pairs.where(col("id") === 1L)
      .withColumn("id", lit(7L)))
    val g2 = Preferences.exactPairGroups(withDup,
      "prompt", "chosen_str", "id").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(g2(("p1", "a b c")).getAs[Long]("n_copies") === 2L)
    assert(g2(("p1", "a b c")).getAs[Long]("keeper_id") === 1L)
    // reuse: "a b c" chosen under p1 (id 1), p3 (id 5), and p4 (id 6)
    val reuse = Preferences.responseReuse(pairs, "prompt", "chosen_str")
      .collect()
    assert(reuse.length === 1)
    assert(reuse.head.getAs[String]("chosen_str") === "a b c")
    assert(reuse.head.getAs[Long]("n_prompts") === 3L)
    assert(reuse.head.getAs[Long]("n_pairs") === 3L)
  }
}
