package graft

import graft.operators.Constraints
import graft.operators.Constraints._

/** Declarative constraint audit: metric math, null handling, empty
  * input, and the one-job plan shape.
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 10.0, "en"),
    (2L, Some("b"), 20.0, "en"),
    (3L, None, 30.0, "fr"),
    (4L, Some("d"), 999.0, "xx"),
    (4L, Some("e"), 40.0, "en") // duplicate id
  ).toDF("id", "name", "score", "lang")

  test("audit: per-check metrics and verdicts") {
    val out = Constraints.audit(df, Seq(
      Completeness("name", 900000L),            // 4/5 = 800000 -> fail
      InRange("score", 1.0, 100.0, 800000L),    // 4/5 -> pass
      InSet("lang", Seq("en", "fr"), 800000L),  // 4/5 -> pass
      MatchesRegex("name", "^[a-c]$", 400000L), // a,b of 5 -> 400000 pass
      Distinctness(Seq("id"), 1000000L)         // 4/5 -> fail
    )).collect().map(r => r.getString(0) -> r).toMap
    assert(out("completeness(name)").getLong(1) === 800000L)
    assert(!out("completeness(name)").getBoolean(3))
    assert(out("in_range(score,1.0,100.0)").getLong(1) === 800000L)
    assert(out("in_range(score,1.0,100.0)").getBoolean(3))
    assert(out("in_set(lang)").getBoolean(3))
    assert(out("matches_regex(name)").getLong(1) === 400000L)
    assert(out("matches_regex(name)").getBoolean(3))
    assert(out("distinctness(id)").getLong(1) === 800000L)
    assert(!out("distinctness(id)").getBoolean(3))
  }

  test("audit: empty input fails every check, not vacuously passes") {
    val out = Constraints.audit(df.limit(0), Seq(
      Completeness("name", 0L),
      InRange("score", 0.0, 1e9, 0L)
    )).collect().map(r => r.getString(0) -> r).toMap
    // metric 0; thresholds 0 so metric>=0 would pass — the contract is
    // metric=0 on empty, verdict then follows the threshold
    assert(out("completeness(name)").getLong(1) === 0L)
    assert(out("completeness(name)").getBoolean(3))
    val strict = Constraints.audit(df.limit(0),
      Seq(Completeness("name", 1L))).collect()
    assert(!strict.head.getBoolean(3))
  }

  test("refIntegrity: orphans, null keys, parent coverage") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Constraints.refIntegrity(child, "fk", parent, "pk", "c->p")
      .collect().head
    assert(r.getAs[String]("relation") === "c->p")
    assert(r.getAs[Long]("n_child") === 5L)
    assert(r.getAs[Long]("n_null_key") === 1L)      // the None row
    assert(r.getAs[Long]("n_orphans") === 1L)       // fk=9, not the null
    assert(r.getAs[Long]("orphan_rate_micro") === 200000L)
    assert(r.getAs[Long]("n_parent") === 3L)
    assert(r.getAs[Long]("n_unreferenced_parent") === 1L) // pk=3
    assert(r.getAs[Long]("coverage_micro") === 666666L)
  }

  test("audit: duplicate check names rejected; plan is one agg + explode") {
    intercept[IllegalArgumentException] {
      Constraints.audit(df, Seq(
        Completeness("name", 1L), Completeness("name", 2L)))
    }
    val plan = Constraints.audit(df,
      Seq(Completeness("name", 1L), InRange("score", 0, 1, 1L)))
      .queryExecution.executedPlan.toString
    // no distinct check -> single hash-agg pair, one exchange, no Expand
    assert(!plan.contains("Expand"), plan)
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 2, plan)
  }
}
