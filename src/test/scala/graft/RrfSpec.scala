package graft

import org.apache.spark.sql.functions._

import graft.operators.Rrf

/** Hand-computed goldens for Reciprocal Rank Fusion. */
class RrfSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fuse: hand-computed scores, n_lists, and fused order") {
    import spark.implicits._
    val lex = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("q", "d", "r")
    val sem = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("q", "d", "r")
    val out = Rrf.fuse(Seq(lex, sem), "q", "d", "r", topK = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    // d20 in both lists: 1/61 + 1/62; d10 lex-only 1/61; d30 sem-only 1/62
    assert(out === Array(
      (20L, r6(1.0 / 61 + 1.0 / 62), 2L, 1L),
      (10L, r6(1.0 / 61), 1L, 2L),
      (30L, r6(1.0 / 62), 1L, 3L)))
  }

  test("fuse: equal scores break ties by ascending doc id; topK truncates") {
    import spark.implicits._
    val a = Seq((1L, 7L, 1), (1L, 3L, 2), (1L, 9L, 3)).toDF("q", "d", "r")
    val b = Seq((1L, 5L, 1), (1L, 8L, 2), (1L, 2L, 3)).toDF("q", "d", "r")
    val out = Rrf.fuse(Seq(a, b), "q", "d", "r", topK = 4)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getLong(4)))
    // rank-1s tie (5 vs 7 -> doc asc), then rank-2s (3 vs 8), topK drops
    // the rank-3 pair entirely
    assert(out === Array((5L, 1L), (7L, 2L), (3L, 3L), (8L, 4L)))
  }

  test("fuse: queries rank independently; single ranking is a pass-through order") {
    import spark.implicits._
    val one = Seq((1L, 4L, 1), (1L, 6L, 2), (2L, 6L, 1), (2L, 4L, 2))
      .toDF("q", "d", "r")
    val out = Rrf.fuse(Seq(one), "q", "d", "r", topK = 10)
      .orderBy(col("q"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out === Array((1L, 4L, 1L), (1L, 6L, 2L),
      (2L, 6L, 1L), (2L, 4L, 2L)))
  }
}
