package graft

import graft.operators.SnapshotDiff

/** Snapshot diff: the four statuses, null-text handling, and
  * whitespace-insensitive fingerprinting.
  */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("added/removed/changed/unchanged classified per id") {
    val old = Seq(
      (1L, "stays the same"),
      (2L, "will change"),
      (3L, "will be removed")).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "stays the same"),
      (2L, "has changed"),
      (4L, "brand new")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("null text: null==null is unchanged, null->text is changed") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val neu = Seq((1L, Option.empty[String]), (2L, Some("now present")))
      .toDF("doc_id", "text")
    val got = SnapshotDiff.diff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("fingerprint ignores whitespace/case, so cosmetic edits are unchanged") {
    val old = Seq((1L, "Hello   World")).toDF("doc_id", "text")
    val neu = Seq((1L, "  hello world ")).toDF("doc_id", "text")
    assert(SnapshotDiff.diff(old, neu, "doc_id", "text")
      .head().getString(1) === "unchanged")
  }

  test("summary counts match the per-id statuses") {
    val old = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val neu = (3L to 12L)
      .map(i => (i, if (i == 5L) "edited" else s"doc $i"))
      .toDF("doc_id", "text")
    val got = SnapshotDiff.diffSummary(old, neu, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("removed" -> 2L, "added" -> 2L,
      "changed" -> 1L, "unchanged" -> 7L))
  }
}
