package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis => TA}

/** Golden tests for the text normalizers on inputs the ASCII-only fixture
  * corpus can't exercise (accents, CJK passthrough, article stripping).
  */
class TextAnalysisSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, input: String): String = {
    import spark.implicits._
    Seq(input).toDF("s").select(c).head().getString(0)
  }

  test("asciiFold maps Latin accents, passes CJK and ASCII through") {
    assert(one(TA.asciiFold(col("s")), "café naïve À BIENTÔT") === "cafe naive A BIENTOT")
    assert(one(TA.asciiFold(col("s")), "北京 plain") === "北京 plain")
    assert(one(TA.asciiFold(col("s")), "unchanged 123") === "unchanged 123")
  }

  test("canonicalize: ES canonicalsort chain (lowercase, strip articles + non-alnum)") {
    assert(one(TA.canonicalize(col("s")), "The Catcher of the Rye!") === "catcherrye")
    assert(one(TA.canonicalize(col("s")), "An  Example, a Test") === "exampletest")
  }

  test("normalize collapses whitespace and case") {
    assert(one(TA.normalize(col("s")), "  A   B\t\nC ") === "a b c")
  }

  test("shingles produce n-grams in order; short docs yield none") {
    import spark.implicits._
    val got = Seq("a b c d").toDF("s")
      .select(TA.shingles(TA.tokens(col("s")), 3).as("sh"))
      .head().getSeq[String](0)
    assert(got === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("s")
      .select(TA.shingles(TA.tokens(col("s")), 3).as("sh"))
      .head().getSeq[String](0)
    assert(short === Seq.empty)
  }

  test("langIdHeuristic: script wins over stopwords; und for no evidence") {
    assert(one(TA.langIdHeuristic(col("s")), "the 北京 record") === "zh")
    assert(one(TA.langIdHeuristic(col("s")), "the quick fox") === "en")
    assert(one(TA.langIdHeuristic(col("s")), "le chat avec rien") === "fr")
    assert(one(TA.langIdHeuristic(col("s")), "xyzzy qwerty") === "und")
  }
}
