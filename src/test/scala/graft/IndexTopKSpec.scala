package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAnn
import graft.plans.{IndexTopK, IndexTopKRule}

/** The index-aware top-k rewrite rule (SURVEY §4, built round 16): flag
  * off = untouched brute plan; flag on over an index table = probe-cell
  * filter injected and BUCKET-PRUNED on the executed plan; nProbe =
  * nCells degenerates to exact brute parity; single-query semantics
  * equal IncrementalAnn.query's probe contract; idempotent under the
  * fixed-point batch; non-index relations never touched.
  */
class IndexTopKSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(ids: Seq[Int]): DataFrame =
    ids.map { i =>
      (i.toLong,
        (0 until 8).map(d => ((i * 31 + d * 17) % 13 - 6).toFloat / 7f))
    }.toDF("vec_id", "embedding")

  private lazy val qv: Seq[Double] =
    (0 until 8).map(d => (((0 * 31 + d * 17) % 13 - 6).toFloat / 7f).toDouble)

  private def naive(table: String, k: Int): DataFrame =
    spark.table(table).select(col("id"),
        round(call_function("graft_cosine",
          typedlit(qv), col("vec")), 4).as("sim4"))
      .orderBy(col("sim4").desc, col("id")).limit(k)

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted

  private def indexScanBuckets(df: DataFrame): Seq[Option[Int]] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    })
    allNodes(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.optionalBucketSet.map(_.cardinality())
    }
  }

  private def cellFilters(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
    p.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.In] => f
    }.size

  private def withFlag[A](nProbe: Int)(f: => A): A = {
    spark.conf.set(IndexTopK.EnabledKey, "true")
    spark.conf.set(IndexTopK.NProbeKey, nProbe.toString)
    try f
    finally {
      spark.conf.set(IndexTopK.EnabledKey, "false")
      spark.conf.unset(IndexTopK.NProbeKey)
    }
  }

  private def freshIndex(): Unit = {
    dropTable("itk_idx")
    dropTable(IncrementalAnn.centroidsTableName("itk_idx"))
    dropTable(IncrementalAnn.tombstonesTableName("itk_idx"))
    IncrementalAnn.append(vecs(0 until 40), "vec_id", "embedding",
      "itk_idx", nCells = 4)
  }

  test("flag off: the brute plan is untouched (all buckets read); " +
    "flag on at nProbe = nCells: the rewrite fires and results equal " +
    "brute EXACTLY (the degenerate-parity contract)") {
    graft.plans.GraftFunctions.register(spark)
    freshIndex()
    val brute = naive("itk_idx", 5)
    val bruteRows = rows(brute)
    assert(bruteRows.nonEmpty)
    // untouched: no probe filter in the optimized plan
    assert(cellFilters(brute.queryExecution.optimizedPlan) === 0,
      brute.queryExecution.optimizedPlan.toString)
    val (degRows, degFilters) = withFlag(nProbe = 4) {
      val df = naive("itk_idx", 5)
      (rows(df), cellFilters(df.queryExecution.optimizedPlan))
    }
    assert(degFilters === 1, "rewrite did not fire at nProbe=nCells")
    assert(degRows === bruteRows,
      "nProbe = nCells must be exactly the brute result")
  }

  test("flag on at nProbe=2: the executed scan is bucket-pruned to <= 2 " +
    "of 4 buckets and results equal IncrementalAnn.query's single-query " +
    "probe contract") {
    graft.plans.GraftFunctions.register(spark)
    freshIndex()
    val (prunedRows, buckets) = withFlag(nProbe = 2) {
      val df = naive("itk_idx", 5)
      val r = rows(df)
      (r, indexScanBuckets(df))
    }
    assert(buckets.nonEmpty, "no file scan found in the executed plan")
    assert(buckets.exists(_.exists(_ <= 2)),
      s"index scan not bucket-pruned: $buckets")
    // reference semantics: the family's own probe contract, single query,
    // no self-exclusion (the naive plan has none), cap gate wide open
    val ref = IncrementalAnn.query(
        Seq((0L, qv)).toDF("vec_id", "embedding")
          .select(col("vec_id"), col("embedding").cast("array<float>")
            .as("embedding")),
        "vec_id", "embedding", "itk_idx", k = 5, nProbe = 2,
        maxCellSize = 1000000, excludeSelf = false)
      .select(col("n_id"), col("sim4")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(prunedRows === ref,
      "rewritten plan diverged from the probe contract")
  }

  test("idempotent under repeated application (the fixed-point batch) " +
    "and inert on relations that are not index tables") {
    graft.plans.GraftFunctions.register(spark)
    freshIndex()
    val rule = IndexTopKRule(spark)
    withFlag(nProbe = 2) {
      val analyzed = naive("itk_idx", 5).queryExecution.analyzed
      val once = rule(analyzed)
      val twice = rule(once)
      assert(cellFilters(once) === 1, once.toString)
      assert(cellFilters(twice) === 1,
        s"second application stacked another filter:\n$twice")
      // a table with the same shape but NO centroid sidecar: untouched
      dropTable("itk_plain")
      spark.table("itk_idx").write.saveAsTable("itk_plain")
      val plain = naive("itk_plain", 5)
      assert(cellFilters(plain.queryExecution.optimizedPlan) === 0,
        plain.queryExecution.optimizedPlan.toString)
      // and the plain results are the brute ones (sanity: same data)
      assert(rows(plain) === rows(naive("itk_plain", 5)))
      dropTable("itk_plain")
    }
    dropTable("itk_idx")
    dropTable(IncrementalAnn.centroidsTableName("itk_idx"))
  }
}
