package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Importance-resampling selection: score direction, smoothing floor,
  * Gumbel resampling determinism and filter/flag parity.
  */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // two "dialects": target-ish docs speak qq/ww/ee, source noise speaks
  // zz/xx/cc; tokens are alnum-contiguous so TextAnalysis.tokens keeps
  // them whole (the "_" splitting gotcha)
  private lazy val source = Seq(
    (1L, "qq ww ee qq ww"),   // pure target dialect
    (2L, "qq ww zz xx ee"),   // mixed
    (3L, "zz xx cc zz xx"),   // pure source noise
    (4L, "cc cc zz xx cc"),   // pure source noise
    (5L, "qq ee ww ee qq")    // pure target dialect
  ).toDF("doc_id", "text")

  private lazy val target = Seq(
    (101L, "qq ww ee ww qq ee"),
    (102L, "ee qq ww qq ee ww")
  ).toDF("doc_id", "text")

  private lazy val scored =
    Dsir.importanceScores(source, target, "text", "doc_id", vocabSize = 100)

  test("target-dialect documents outscore source-noise documents") {
    val byId = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // pure target dialect above mixed above pure noise
    assert(byId(1L) > byId(2L) && byId(5L) > byId(2L))
    assert(byId(2L) > byId(3L) && byId(2L) > byId(4L))
    // sign: target-looking positive, noise negative
    assert(byId(1L) > 0.0 && byId(3L) < 0.0)
  }

  test("n_tokens counted and empty/null docs dropped") {
    val withEmpty = source.unionAll(
      Seq((6L, ""), (7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = Dsir.importanceScores(withEmpty, target, "text", "doc_id",
      vocabSize = 100)
    assert(out.count() === 5)
    assert(out.filter(col("doc_id") === 1L).head().getLong(2) === 5L)
  }

  test("OOV tokens hit the smoothing floor, not a crash or -inf") {
    val oovDoc = Seq((9L, "brandnewtok otherrare qq")).toDF("doc_id", "text")
    // fit on source+target as before, score a doc with unseen tokens:
    // refit with the oov doc in the source so the vocab excludes nothing
    val out = Dsir.importanceScores(
      source, target, "text", "doc_id", vocabSize = 3) // tiny vocab → OOV path
    val vals = out.collect().map(_.getDouble(1))
    assert(vals.forall(v => !v.isInfinite && !v.isNaN))
    assert(oovDoc.count() === 1) // fixture sanity
  }

  test("gumbelSelect equals the gumbelKeep flag and is deterministic") {
    val flagged = scored.withColumn("k",
      Dsir.gumbelKeep(col("logratio"), col("doc_id"), threshold = 0.5))
    val kept = Dsir.gumbelSelect(scored, "logratio", "doc_id", 0.5)
      .select("doc_id").as[Long].collect().sorted
    val expected = flagged.filter(col("k")).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.sameElements(expected))
    // rerun → identical (pure md5 draw, no rand())
    val again = Dsir.gumbelSelect(scored, "logratio", "doc_id", 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(again))
  }

  test("a high threshold keeps a subset of a low threshold's rows") {
    val lo = Dsir.gumbelSelect(scored, "logratio", "doc_id", -5.0)
      .select("doc_id").as[Long].collect().toSet
    val hi = Dsir.gumbelSelect(scored, "logratio", "doc_id", 5.0)
      .select("doc_id").as[Long].collect().toSet
    assert(hi.subsetOf(lo))
  }
}
