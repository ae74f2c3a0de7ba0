package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Spherical k-means: recovery of separated clusters, determinism across
  * physical layout, empty-cluster centroid retention, and guards.
  */
class ClusteringSpec extends SparkSpec {

  // three well-separated directions in 8-d (axis bundles with jitter that
  // never crosses axes), ids interleaved so the md5 seed draw mixes groups
  private def fixture = {
    val sq = spark
    import sq.implicits._
    (0 until 90).map { i =>
      val g = i % 3
      val base = Array.fill(8)(0.01 * (i % 5))
      base(g * 2) = 10.0
      base(g * 2 + 1) = 8.0
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("recovers separated clusters: co-generated points land together") {
    val out = Clustering.kmeansFitAssign(fixture, "vec_id", "embedding",
      k = 3, iters = 4).collect()
    assert(out.length === 90)
    // every point of generator group g maps to one consistent cluster, and
    // different groups map to different clusters
    val byGroup = out.groupBy(r => r.getLong(0) % 3)
      .map { case (g, rows) => g -> rows.map(_.getLong(1)).toSet }
    assert(byGroup.values.forall(_.size === 1), byGroup.toString)
    assert(byGroup.values.flatten.toSet.size === 3, byGroup.toString)
    // assignments to the own-direction centroid are near-perfect cosine
    assert(out.forall(_.getDouble(2) > 0.9))
  }

  test("deterministic across physical layout (repartition changes nothing)") {
    val a = Clustering.kmeansFitAssign(fixture, "vec_id", "embedding",
      k = 3, iters = 2).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val b = Clustering.kmeansFitAssign(fixture.repartition(7), "vec_id",
      "embedding", k = 3, iters = 2).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("empty clusters keep their previous centroid (no crash, k preserved)") {
    val sq = spark
    import sq.implicits._
    // all points identical: after round 1 every point sits in one cluster,
    // the other two receive nothing and must retain their seed centroid
    val same = (0L until 10L).map(i => (i, Seq(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding")
    val centroids = Clustering.kmeansFit(same, "vec_id", "embedding",
      k = 3, iters = 3)
    assert(centroids.length === 3)
    assert(centroids.forall(_.length === 3))
    val out = Clustering.assign(same, "vec_id", "embedding", centroids)
      .collect()
    assert(out.length === 10)
    assert(out.map(_.getLong(1)).toSet.size === 1) // all in one cluster
  }

  test("semDeDupKmeans keeps one point per tight cluster at a high tau") {
    // same-group fixture points are near-identical directions (cosine
    // ~0.999+), so at tau = 0.99 only the lowest-id member of each
    // cluster survives; every drop had a lower-id same-cluster witness
    val out = Clustering.semDeDupKmeans(fixture, "vec_id", "embedding",
      k = 3, iters = 4, tau = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 90)
    val kept = out.filter(_._3 == 1L)
    assert(kept.length === 3, kept.mkString(","))
    // each kept point is the minimum id of its cluster
    val minByCluster = out.groupBy(_._2).map { case (c, rows) =>
      c -> rows.map(_._1).min
    }
    assert(kept.forall { case (id, c, _) => minByCluster(c) === id })
    // degenerate-cluster cap fails fast instead of going quadratic
    intercept[IllegalArgumentException] {
      Clustering.semDeDupKmeans(fixture, "vec_id", "embedding",
        k = 3, iters = 1, tau = 0.5, maxClusterSize = 10L)
    }
    intercept[IllegalArgumentException] {
      Clustering.semDeDupKmeans(fixture, "vec_id", "embedding",
        k = 3, iters = 1, tau = 1.5)
    }
  }

  test("null vectors are excluded; guards reject bad k/iters") {
    val sq = spark
    import sq.implicits._
    val withNull = Seq((1L, Some(Seq(1.0, 0.0))), (2L, None),
      (3L, Some(Seq(0.0, 1.0))))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeansFitAssign(withNull, "vec_id", "embedding",
      k = 2, iters = 1)
    assert(out.count() === 2)
    intercept[IllegalArgumentException] {
      Clustering.kmeansFit(withNull, "vec_id", "embedding", k = 0, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansFit(withNull, "vec_id", "embedding", k = 2, iters = -1)
    }
  }
}
