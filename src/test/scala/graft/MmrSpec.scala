package graft

import org.apache.spark.sql.functions._

import graft.operators.Mmr

/** MMR re-ranking: diversity beats redundancy, λ=1 degenerates to plain
  * relevance rank, short candidate lists, and the λ-granularity guard.
  */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  // candidates for one query: A (rel .9), A' (rel .89, same direction as
  // A), B (rel .5, orthogonal to both)
  private lazy val cand = Seq(
    (1L, 10L, 0.9, Seq(1.0, 0.0, 0.0)),
    (1L, 11L, 0.89, Seq(0.999, 0.001, 0.0)),
    (1L, 12L, 0.5, Seq(0.0, 1.0, 0.0))
  ).toDF("q_id", "n_id", "rel", "v")

  private def picks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.orderBy(col("rank")).select("n_id").as[Long].collect().toSeq

  test("the redundant near-copy is demoted below the orthogonal result") {
    val out = picks(Mmr.rerank(cand, "q_id", "n_id", "rel", "v", k = 3,
      lambda = 0.7))
    // greedy: A first (top rel); A' is almost identical to A, so B's
    // diversity wins step 2 despite lower relevance; A' last
    assert(out === Seq(10L, 12L, 11L))
  }

  test("lambda = 1 ignores redundancy entirely (pure relevance order)") {
    val out = picks(Mmr.rerank(cand, "q_id", "n_id", "rel", "v", k = 3,
      lambda = 1.0))
    assert(out === Seq(10L, 11L, 12L))
  }

  test("queries with fewer candidates than k yield fewer rows") {
    val short = cand.filter(col("n_id") < 12L)
    val out = Mmr.rerank(short, "q_id", "n_id", "rel", "v", k = 3,
      lambda = 0.7)
    assert(out.count() === 2)
    assert(out.agg(max(col("rank"))).head().getLong(0) === 2L)
  }

  test("graft_mmr kernel equals the unrolled window/join form on real " +
    "vectors (every column, every lambda in the grid)") {
    val e = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    val knn = graft.operators.Similarity
      .knnBruteForce(e, e, "vec_id", "embedding", 6)
    val vecs = e.select(col("vec_id").as("n_id"),
      col("embedding").cast("array<double>").as("nv"))
    val c = knn.join(vecs, Seq("n_id"))
      .select(col("q_id"), col("n_id"), col("sim4"), col("nv"))
      .localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    for (lam <- Seq(0.0, 0.3, 0.7, 1.0)) {
      val viaKernel = rows(
        Mmr.rerank(c, "q_id", "n_id", "sim4", "nv", k = 3, lambda = lam))
      val viaUnrolled = rows(
        Mmr.rerankUnrolled(c, "q_id", "n_id", "sim4", "nv", k = 3,
          lambda = lam))
      assert(viaKernel === viaUnrolled, s"lambda $lam")
    }
  }

  test("graft_mmr fails fast on a null candidate field (never a silent " +
    "divergence from the unrolled reference)") {
    import spark.implicits._
    val withNull = Seq(
      (1L, 10L, Some(0.9), Some(Seq(1.0, 0.0))),
      (1L, 11L, None, Some(Seq(0.0, 1.0)))
    ).toDF("q_id", "n_id", "rel", "v")
    val err = intercept[Exception] {
      Mmr.rerank(withNull, "q_id", "n_id", "rel", "v", k = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("null candidate field")))
  }

  test("graft_mmr fails fast past the candidate bound") {
    import spark.implicits._
    val big = (0 until 5000).map(i => (1L, i.toLong, 0.5, Seq(1.0, 0.0)))
      .toDF("q_id", "n_id", "rel", "v")
    val err = intercept[Exception] {
      Mmr.rerank(big, "q_id", "n_id", "rel", "v", k = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("exceeded 4096 candidates")))
  }

  test("lambda must be a multiple of 0.1") {
    val e = intercept[IllegalArgumentException] {
      Mmr.rerank(cand, "q_id", "n_id", "rel", "v", k = 2, lambda = 0.75)
    }
    assert(e.getMessage.contains("multiple of 0.1"))
  }

  test("rerankKnn composes candidates and rerank deterministically") {
    val e = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Mmr.rerankKnn(e, "vec_id", "embedding", c = 5, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val b = Mmr.rerankKnn(e, "vec_id", "embedding", c = 5, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(a === b)
    // every query keeps exactly 2 picks and rank-1 is the exact-KNN top-1
    assert(a.count(_._3 == 1L) === e.count())
  }
}
