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

  test("spanContaminationVs: train doc quoting an eval answer is flagged with the run length") {
    val evalDoc = (1 to 12).map(i => s"e${i}z")
    val train = toksDf(
      10L -> (fill(10, 6) ++ evalDoc.slice(0, 10) ++ fill(10, 6, 100)),
      11L -> fill(11, 20))
    val ev = toksDf(900L -> evalDoc)
    val out = SpanDedup.spanContaminationVs(train, ev, "text", "doc_id",
      "doc_id", l = 5, minSpan = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(10L -> ((10L, 1L))))
  }

  test("spanContaminationVs counts distinct leaking eval docs") {
    val q = (1 to 9).map(i => s"q${i}z")
    val train = toksDf(20L -> (fill(20, 4) ++ q ++ fill(20, 4, 100)))
    val ev = toksDf(901L -> (fill(91, 3) ++ q), 902L -> (q ++ fill(92, 3)))
    val out = SpanDedup.spanContaminationVs(train, ev, "text", "doc_id",
      "doc_id", l = 5, minSpan = 9).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 9L && out.head.getLong(2) === 2L)
  }

  test("spanContaminationVs: sub-minSpan overlap stays clean") {
    val q = (1 to 6).map(i => s"r${i}z")
    val train = toksDf(30L -> (fill(30, 5) ++ q ++ fill(30, 5, 100)))
    val ev = toksDf(903L -> (fill(93, 2) ++ q ++ fill(93, 2, 200)))
    assert(SpanDedup.spanContaminationVs(train, ev, "text", "doc_id",
      "doc_id", l = 5, minSpan = 8).count() === 0)
  }
}
