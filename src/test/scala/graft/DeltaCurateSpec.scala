package graft

import org.apache.spark.sql.functions._

import graft.processes.DeltaCurate
import graft.operators.Curation

/** Delta curation e2e: two monthly increments against persisted indexes —
  * only the delta is processed, history-duplicate documents drop, and the
  * second month's delta deduplicates against the first month's survivors.
  */
class DeltaCurateSpec extends SparkSpec {

  import spark.implicits._

  private def doc(i: Int, salt: String = "") =
    ((1 to 35).map(k => s"w${i}t$k") :+ salt).mkString(" ").trim

  private val cfg = Curation.Config(minTokens = 30, maxStopRatio = 1.0,
    langs = Seq("en"))

  private def cleanTables(): Unit = {
    spark.sql("DROP TABLE IF EXISTS dc_fp")
    spark.sql("DROP TABLE IF EXISTS dc_sig")
  }

  test("two increments: delta-only processing, cross-month index dedup") {
    cleanTables()
    val m0 = (1 to 6).map(i => (i.toLong, doc(i), "en")).toDF("doc_id", "text", "lang")
    // month 1: doc 2 materially rewritten, doc 5 cosmetically tweaked,
    // doc 6 removed; added: 7 (fresh), 8 (EXACT copy of doc 1's text),
    // 9 (too short -> gated out)
    val m1 = Seq(
      (1L, doc(1), "en"),
      (2L, doc(20), "en"),
      (3L, doc(3), "en"), (4L, doc(4), "en"),
      (5L, doc(5) + " tweak", "en"),
      (7L, doc(7), "en"),
      (8L, doc(1), "en"),
      (9L, "too short", "en")).toDF("doc_id", "text", "lang")

    val r0 = DeltaCurate.run(m0.limit(0), m0, "doc_id", "text", "lang", cfg,
      "dc_fp", "dc_sig", buckets = 4)
    // bootstrap month: everything is "added", everything survives
    assert(r0.added === 6L && r0.changed === 0L && r0.removed === 0L)
    assert(r0.survivors.count() === 6L)

    val r1 = DeltaCurate.run(m0, m1, "doc_id", "text", "lang", cfg,
      "dc_fp", "dc_sig", buckets = 4)
    assert(r1.added === 3L && r1.changed === 2L && r1.removed === 1L)
    // gate drops doc 9; delta = {2, 5 (changed), 7, 8} after gating
    assert(r1.gated === 4L)
    // doc 8 duplicates month-0 doc 1 via the PERSISTED exact index; doc
    // 5's cosmetic tweak is a near-dup of ITS OWN previous version in
    // the signature index (suppressed: the corpus keeps the prior
    // version); doc 2's material rewrite and fresh doc 7 survive
    val ids = r1.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L, 7L))
    cleanTables()
  }

  test("near-dup delta against the signature index drops tail-edited rewrites") {
    cleanTables()
    val base = (1 to 4).map(i => (i.toLong, doc(i), "en")).toDF("doc_id", "text", "lang")
    DeltaCurate.run(base.limit(0), base, "doc_id", "text", "lang", cfg,
      "dc_fp", "dc_sig", buckets = 4)
    // month 1 adds a tail-extended near-dup of doc 3 (not byte-identical,
    // so the exact index passes it; the signature index must not)
    val m1 = base.unionAll(
      Seq((40L, doc(3) + " tiny tail", "en")).toDF("doc_id", "text", "lang"))
    val r1 = DeltaCurate.run(base, m1, "doc_id", "text", "lang", cfg,
      "dc_fp", "dc_sig", buckets = 4)
    assert(r1.added === 1L)
    assert(r1.survivors.count() === 0L)
    cleanTables()
  }
}
