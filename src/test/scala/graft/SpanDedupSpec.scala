package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanDedup

/** Exact shared-span detection: span lengths from the diagonal merge,
  * multiple spans per pair, the df cap, the minSpan floor, and the
  * per-document rollup.
  */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  private def fill(doc: Int, n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => s"f${doc}q$i")

  private def toksDf(rows: (Long, Seq[String])*) =
    rows.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")

  private val shared10 = (1 to 10).map(i => s"s${i}z")
  private val shared8 = (1 to 8).map(i => s"u${i}z")
  private val shared9 = (1 to 9).map(i => s"v${i}z")

  test("a 10-token verbatim run is reported as max_span 10") {
    val df = toksDf(
      1L -> (fill(1, 5) ++ shared10 ++ fill(1, 5, 100)),
      2L -> (fill(2, 7) ++ shared10 ++ fill(2, 4, 100)))
    val out = SpanDedup.sharedSpans(df, "text", "doc_id",
      l = 5, minSpan = 8, maxDf = 50).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getLong(1) === 2L)
    assert(out.head.getLong(2) === 10L) // max_span
    assert(out.head.getLong(3) === 1L)  // n_spans
  }

  test("two disjoint shared runs count separately; the longer one wins max") {
    val df = toksDf(
      3L -> (fill(3, 5) ++ shared8 ++ fill(3, 6, 100) ++ shared9),
      4L -> (fill(4, 3) ++ shared8 ++ fill(4, 9, 100) ++ shared9))
    val out = SpanDedup.sharedSpans(df, "text", "doc_id",
      l = 5, minSpan = 8, maxDf = 50).collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 9L)
    assert(out.head.getLong(3) === 2L)
  }

  test("a run shorter than minSpan is dropped, visible at a lower floor") {
    val s7 = (1 to 7).map(i => s"w${i}z")
    val df = toksDf(
      5L -> (fill(5, 5) ++ s7 ++ fill(5, 5, 100)),
      6L -> (fill(6, 5) ++ s7 ++ fill(6, 5, 100)))
    assert(SpanDedup.sharedSpans(df, "text", "doc_id",
      l = 5, minSpan = 8, maxDf = 50).count() === 0)
    val low = SpanDedup.sharedSpans(df, "text", "doc_id",
      l = 5, minSpan = 5, maxDf = 50).collect()
    assert(low.length === 1 && low.head.getLong(2) === 7L)
  }

  test("boilerplate grams above the df cap never pair") {
    val boiler = (1 to 12).map(i => s"b${i}z")
    val rows = (1 to 12).map(d =>
      d.toLong -> (fill(d, 3) ++ boiler ++ fill(d, 3, 100)))
    val df = toksDf(rows: _*)
    assert(SpanDedup.sharedSpans(df, "text", "doc_id",
      l = 5, minSpan = 8, maxDf = 10).count() === 0)
    // under the cap the same corpus pairs quadratically
    assert(SpanDedup.sharedSpans(df, "text", "doc_id",
      l = 5, minSpan = 8, maxDf = 50).count() === 12L * 11 / 2)
  }

  test("spanContamination rolls pairs up symmetrically per document") {
    val df = toksDf(
      1L -> (fill(1, 5) ++ shared10),
      2L -> (fill(2, 5) ++ shared10),
      3L -> (fill(3, 5) ++ shared10))
    val out = SpanDedup.spanContamination(df, "text", "doc_id",
      l = 5, minSpan = 8, maxDf = 50)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // every doc shares the 10-run with both others
    assert(out === Map(1L -> ((10L, 2L)), 2L -> ((10L, 2L)),
      3L -> ((10L, 2L))))
  }
}
