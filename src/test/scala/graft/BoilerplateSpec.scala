package graft

import org.apache.spark.sql.functions._

import graft.operators.Boilerplate

/** Boilerplate line removal: discovery by distinct-doc frequency, exact
  * cleaning semantics (order, blanks, whitespace, tabs, nulls), the
  * literal-set cap, and the exchange-free apply plan.
  */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  // 10 docs sharing a footer; doc body unique; docs 0-4 also share a
  // header; blank lines separate body from footer
  private def corpus = (0 until 10).map { i =>
    val header = if (i < 5) "  shared header  \n" else ""
    (i.toLong, s"${header}body text $i\n\nshared footer")
  }.toDF("doc_id", "text")

  test("heavyLines counts distinct documents, not occurrences") {
    // footer appears twice in doc 0 but that still counts once
    val docs = corpus.withColumn("text",
      when(col("doc_id") === 0, concat(col("text"), lit("\nshared footer")))
        .otherwise(col("text")))
    val heavy = Boilerplate.heavyLines(docs, "doc_id", "text", minDocs = 6L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(heavy === Map("shared footer" -> 10L))
    // header reaches 5 docs: included at minDocs = 5 (trimmed form)
    val atFive = Boilerplate.heavyLines(docs, "doc_id", "text", minDocs = 5L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(atFive === Map("shared footer" -> 10L, "shared header" -> 5L))
  }

  test("stripBoilerplate drops matching lines wherever they appear, keeps order and blanks") {
    val out = Boilerplate.stripBoilerplate(
        corpus, "doc_id", "text", minDocs = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    // doc 0: header (trimmed match despite padding) + footer dropped
    assert(out(0) === ((0L, "body text 0\n", 2L)))
    // doc 7: no header, footer dropped, blank line survives
    assert(out(7) === ((7L, "body text 7\n", 1L)))
    assert(out.forall { case (_, clean, _) => !clean.contains("footer") })
  }

  test("blank and tab-bearing lines are never boilerplate") {
    val docs = (0 until 6).map(i =>
      (i.toLong, s"a\tb\n   \nunique $i")).toDF("doc_id", "text")
    val heavy = Boilerplate.heavyLines(docs, "doc_id", "text", minDocs = 3L)
    assert(heavy.count() === 0)
    val out = Boilerplate.stripBoilerplate(docs, "doc_id", "text", 3L)
      .collect()
    assert(out.forall(_.getLong(2) === 0L))
  }

  test("null text passes through as null; cap fails fast") {
    val docs = Seq((1L, "x\ny"), (2L, null.asInstanceOf[String]),
      (3L, "x\nz"), (4L, "x")).toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplate(docs, "doc_id", "text", 3L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(2L) === null)
    assert(out(1L) === "y")
    val err = intercept[IllegalArgumentException] {
      Boilerplate.stripBoilerplate(docs, "doc_id", "text", 3L,
        maxHeavyLines = 0)
    }
    assert(err.getMessage.contains("maxHeavyLines"))
    val twoHeavy = Seq((1L, "x\ny"), (3L, "x\ny"), (4L, "x\ny"))
      .toDF("doc_id", "text")
    val cap = intercept[IllegalArgumentException] {
      Boilerplate.stripBoilerplate(twoHeavy, "doc_id", "text", 2L,
        maxHeavyLines = 1)
    }
    assert(cap.getMessage.contains("heavy lines"))
  }

  test("kernel matches an unnest/anti-join reference on a mixed corpus") {
    val docs = (0 until 30).map { i =>
      val lines = Seq(s"promo ${i % 3}", s"unique line $i", "", s"tail ${i % 2}")
      (i.toLong, lines.mkString("\n"))
    }.toDF("doc_id", "text")
    val got = Boilerplate.stripBoilerplate(docs, "doc_id", "text", 10L)
    // reference: explode + join + re-assemble
    val heavy = Boilerplate.heavyLines(docs, "doc_id", "text", 10L)
      .collect().map(_.getString(0)).toSet
    val exp = docs.collect().map { r =>
      val all = r.getString(1).split("\n", -1)
      val kept = all.filterNot(l => l.trim.nonEmpty && heavy.contains(l.trim))
      r.getLong(0) -> ((kept.mkString("\n"), (all.length - kept.length).toLong))
    }.toMap
    val gotMap = got.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(gotMap === exp)
  }
}
