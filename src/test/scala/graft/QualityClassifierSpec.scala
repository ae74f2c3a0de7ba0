package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** Logistic-regression quality classifier: learns an obvious signal,
  * deterministic across physical layout, bias-only scoring for empty
  * docs, micro-unit update arithmetic, and guards.
  */
class QualityClassifierSpec extends SparkSpec {

  // 40 "good" docs say the marker word, 40 "bad" docs never do; filler
  // tokens are shared so only the marker separates the classes
  private def fixture = {
    val sq = spark
    import sq.implicits._
    (0 until 80).map { i =>
      val good = i % 2 == 0
      val filler = s"common words here batch ${i % 7}"
      val text = if (good) s"$filler quality prose" else s"$filler junk"
      (i.toLong, text, good)
    }.toDF("doc_id", "text", "is_good")
  }

  test("learns the separating tokens: marker weights pull apart") {
    val m = QualityClassifier.fit(fixture, "text", "doc_id",
      col("is_good"), vocabSize = 16, iters = 4, lr = 1.0)
    // both markers are frequent enough to be in the top-16 vocabulary
    assert(m.weights.contains("quality"), m.weights.keySet.toString)
    assert(m.weights.contains("junk"), m.weights.keySet.toString)
    assert(m.weights("quality") > 0L, m.weights("quality").toString)
    assert(m.weights("junk") < 0L, m.weights("junk").toString)
    // and the fitted model separates the classes
    val scored = QualityClassifier.score(fixture, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val good = (0 until 80 by 2).map(i => scored(i.toLong))
    val bad = (1 until 80 by 2).map(i => scored(i.toLong))
    assert(good.min > bad.max,
      s"good min ${good.min} vs bad max ${bad.max}")
  }

  test("deterministic across physical layout (repartition changes nothing)") {
    val a = QualityClassifier.fit(fixture, "text", "doc_id",
      col("is_good"), vocabSize = 16, iters = 2)
    val b = QualityClassifier.fit(fixture.repartition(7), "text", "doc_id",
      col("is_good"), vocabSize = 16, iters = 2)
    assert(a === b)
  }

  test("null/empty text scores at the bias-only logit") {
    val sq = spark
    import sq.implicits._
    val docs = Seq((1L, "quality quality quality", true),
      (2L, null.asInstanceOf[String], false), (3L, "", false))
      .toDF("doc_id", "text", "is_good")
    val m = QualityClassifier.fit(docs, "text", "doc_id", col("is_good"),
      vocabSize = 4, iters = 2)
    val out = QualityClassifier.score(docs, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // docs 2 and 3 both have zero tokens → identical bias-only score
    assert(out(2L) === out(3L))
    assert(out(1L) > out(2L))
  }

  test("zero iterations leaves the zero model: every score is 0.5") {
    val m = QualityClassifier.fit(fixture, "text", "doc_id",
      col("is_good"), vocabSize = 8, iters = 0)
    assert(m.biasInt === 0L)
    assert(m.weights.values.forall(_ === 0L))
    val out = QualityClassifier.score(fixture, "text", "doc_id", m).collect()
    assert(out.forall(_.getDouble(1) === 0.5))
    assert(out.forall(_.getLong(2) === 1L)) // 0.5 >= 0.5 boundary
  }

  test("guards: vocabSize and iters bounds") {
    intercept[IllegalArgumentException] {
      QualityClassifier.fit(fixture, "text", "doc_id", col("is_good"),
        vocabSize = 0)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.fit(fixture, "text", "doc_id", col("is_good"),
        vocabSize = 8, iters = -1)
    }
  }

  test("evaluate: midrank AUC matches brute-force pair counting, metrics exact") {
    import spark.implicits._
    // scores with a tie straddling the classes: brute-force AUC =
    // (concordant + 0.5·tied) / (np·nn)
    // pairs (pos, neg): (0.9,0.1)=1 (0.9,0.5)=1 (0.5,0.1)=1 (0.5,0.5)=0.5
    //                   (0.3,0.1)=1 (0.3,0.5)=0  → 4.5 / 6 = 0.75
    val scored = Seq(
      (0.9, 1L, 1L), (0.5, 1L, 1L), (0.3, 0L, 1L),
      (0.5, 1L, 0L), (0.1, 0L, 0L)).toDF("score", "pred", "y")
    val r = QualityClassifier.evaluate(scored).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.75)
    // tp=2 (0.9, 0.5-pos), fp=1 (0.5-neg), fn=1 (0.3), tn=1 (0.1)
    assert(r.getDouble(3) === 0.6)                 // accuracy 3/5
    assert(r.getDouble(4) === round6(2.0 / 3.0))   // prec 2/3
    assert(r.getDouble(5) === round6(2.0 / 3.0))   // rec 2/3
    assert(r.getDouble(6) === round6(2.0 / 3.0))   // f1 4/6
  }

  test("evaluate: degenerate single-class frame yields null AUC, not a blow-up") {
    import spark.implicits._
    val onlyPos = Seq((0.9, 1L, 1L), (0.2, 0L, 1L)).toDF("score", "pred", "y")
    val r = QualityClassifier.evaluate(onlyPos).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L)
    assert(r.isNullAt(2))           // auc undefined
    assert(r.getDouble(3) === 0.5)  // accuracy still defined
    assert(r.isNullAt(5) === false) // recall defined (positives exist)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("evaluateCalibration: bins, means, rates; 1.0 joins the top bin") {
    import spark.implicits._
    val scored = Seq(
      (0.05, 0L, 0L), (0.08, 0L, 1L),  // bin 0: n=2, rate 0.5
      (0.55, 1L, 1L),                  // bin 5: n=1, rate 1.0
      (0.95, 1L, 1L), (1.0, 1L, 0L)    // bin 9 (1.0 clamps): n=2, rate 0.5
    ).toDF("score", "pred", "y")
    val out = QualityClassifier.evaluateCalibration(scored)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0L, 2L, 0.065, 0.5),
      (5L, 1L, 0.55, 1.0),
      (9L, 2L, 0.975, 0.5)))
  }
}
