package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** PageRank: exact match against a driver-side reference power
  * iteration (same per-round rounding), dangling-mass conservation,
  * determinism across layout, and guards.
  */
class PageRankSpec extends SparkSpec {

  private def round8(x: Double): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference implementation over in-memory maps, identical rounding. */
  private def reference(
      edges: Seq[(Long, Long)], iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> round8(1.0 / n)).toMap
    (0 until iters).foreach { _ =>
      val dangling = nodes.filterNot(deg.contains).map(r).sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(v => v ->
        round8((1.0 - d) / n +
          d * (in.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  // 1 -> {2, 3}, 2 -> {1}; node 3 is DANGLING (no out-edges)
  private val danglingGraph = Seq((1L, 2L), (1L, 3L), (2L, 1L))

  test("matches the reference power iteration exactly, dangling mass included") {
    val sq = spark
    import sq.implicits._
    val e = danglingGraph.toDF("src", "dst")
    for (iters <- Seq(0, 1, 3)) {
      val got = PageRank.run(e, "src", "dst", iters).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === reference(danglingGraph, iters), s"iters=$iters")
    }
  }

  test("dangling redistribution conserves total mass (sums to ~1)") {
    val sq = spark
    import sq.implicits._
    val e = danglingGraph.toDF("src", "dst")
    val total = PageRank.run(e, "src", "dst", iters = 5)
      .agg(sum(col("rank"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, total.toString)
  }

  test("deterministic across physical layout") {
    val sq = spark
    import sq.implicits._
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 200), (i, (i * 13 + 5) % 200)))
    val a = PageRank.run(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = PageRank.run(edges.toDF("src", "dst").repartition(11),
        "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("guards: bad iters/damping, empty graph") {
    val sq = spark
    import sq.implicits._
    val e = danglingGraph.toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.run(e, "src", "dst", iters = -1)
    }
    intercept[IllegalArgumentException] {
      PageRank.run(e, "src", "dst", iters = 1, damping = 1.5)
    }
    intercept[IllegalArgumentException] {
      PageRank.run(Seq.empty[(Long, Long)].toDF("src", "dst"),
        "src", "dst", 1)
    }
  }
}
