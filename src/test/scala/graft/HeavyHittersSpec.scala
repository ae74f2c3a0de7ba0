package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Heavy hitters: exactness vs the naive groupBy at any sketch width,
  * threshold edges, null handling, and the token-stream wrapper.
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def freqDf = {
    // key "k<i>" occurs i times, i in 1..20
    val rows = (1 to 20).flatMap(i => Seq.fill(i)(s"k$i"))
    rows.toDF("k")
  }

  test("matches the exact groupBy result, threshold boundary included") {
    val got = HeavyHitters.heavyHitters(freqDf, "k", minCount = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = (7 to 20).map(i => s"k$i" -> i.toLong).toMap
    assert(got === exp)
  }

  test("stays exact even with a deliberately collision-heavy (wide-eps) sketch") {
    // eps 0.5 → width 4: nearly everything collides, candidates balloon,
    // but the exact verify keeps the answer identical
    val got = HeavyHitters.heavyHitters(freqDf, "k", minCount = 15L, eps = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === (15 to 20).map(i => s"k$i" -> i.toLong).toMap)
  }

  test("null keys never count; empty input yields an empty frame") {
    val withNulls = (Seq.fill(5)(Some("a")) ++ Seq.fill(5)(None))
      .toDF("k")
    val got = HeavyHitters.heavyHitters(withNulls, "k", minCount = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 5L))
    val empty = HeavyHitters.heavyHitters(
      withNulls.filter(lit(false)), "k", minCount = 1L)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("k", "cnt"))
  }

  test("heavyTokens counts the token stream, not documents") {
    val df = Seq(
      (1L, "spark spark spark flink"),
      (2L, "spark flink duck"),
      (3L, (1 to 30).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    val got = HeavyHitters.heavyTokens(df, "text", minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("spark" -> 4L, "flink" -> 2L))
  }

  test("probe predicate keeps a superset: no exact-count row is ever lost") {
    // integer-ish keys as strings, zipf-ish repetition
    val rows = (1 to 300).flatMap(i => Seq.fill(1 + (300 / i) / 3)(s"w$i"))
    val df = rows.toDF("k")
    val exact = df.groupBy("k").count().filter(col("count") >= 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.heavyHitters(df, "k", minCount = 10L, eps = 0.3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }
}
