package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns ([EXT], SURVEY.md §7.2 step 6;
  * two-stage top-k layout per the distributed similarity-search literature in
  * PAPERS.md).
  *
  * Two paths:
  *  - `knnBruteForce` — exact: broadcast the candidate side, score all pairs,
  *    keep top-k per query via a rank window. Correctness baseline; O(Q×N).
  *    At 100 TB this is only sane when one side is broadcastable (the usual
  *    "small query batch vs huge corpus" shape — the corpus side streams
  *    through the scan, nothing shuffles but the per-query top-k rows).
  *  - `annLsh` — approximate scale path: hyperplane-sign sketches put
  *    near-parallel vectors in the same bucket; scoring happens only within
  *    buckets (equi-join on bucket id ⇒ plain shuffle hash join, no
  *    cartesian). Recall is tunable via nBits/band count; candidates
  *    per bucket are capped so a degenerate bucket cannot go quadratic.
  */
object Similarity {

  /** Exact top-k cosine neighbors for every vector in `queries` against
    * `corpus` (self-join when they're the same frame). Ranks on the
    * 4-decimal-rounded similarity with id tiebreak, so results are
    * deterministic and stable across engines and partitionings.
    */
  def knnBruteForce(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(queries.sparkSession)
    // graft_cosine (one fused codegen loop) and NOT normalize-once+dot:
    // this path is hash-compared against DuckDB's list_cosine_similarity,
    // which divides the raw dot by the norms — same operation sequence ⇒
    // same rounded value. Normalizing first changes the per-element
    // rounding (~1e-14), enough to flip a 4-decimal boundary on rare pairs
    // and fail the gate non-deterministically. The rows-only ANN paths
    // keep the cheaper normalize+dot scoring.
    val q = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"),
      asDouble(col(vecCol)).as("n_vec"))
    val scored = q.crossJoin(broadcast(c))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(expr("graft_cosine(q_vec, n_vec)"), 4).as("sim4"))
    topKPerQuery(scored, k)
  }

  /** Bounded partial-aggregable top-k: the exchange after scoring carries
    * O(queries × k) rows — a row_number window would shuffle and sort the
    * entire scored pair stream. Expects (q_id, n_id, sim4).
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(expr(s"graft_topk(n_id, sim4, $k)").as("topk"))
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("n_id"), col("t.score").as("sim4"),
        (col("pos") + 1).cast("long").as("rn"))

  /** IVF coarse quantizer: deterministic seeding (hash of id → cell) + one
    * Lloyd iteration with the VectorAvg partial aggregate, then nearest-
    * centroid assignment by cosine (argmax via max_by over a broadcast
    * centroid table). At 100 TB: training touches each vector twice
    * (seed-agg + assign), both map-side-combined; no iteration loop, no
    * collect of vectors.
    */
  def ivfCells(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("__seed_cell", pmod(xxhash64(col(idCol)), lit(nCells.toLong)))
    val centroids = v.groupBy(col("__seed_cell").as("cell"))
      .agg(expr("graft_vector_avg(__v)").as("centroid"))
    v.crossJoin(broadcast(centroids))
      .select(col(idCol), col("__v"),
        col("cell"), expr("graft_cosine(__v, centroid)").as("__sim"))
      .groupBy(col(idCol))
      .agg(max_by(col("cell"), struct(col("__sim"), -col("cell"))).as("cell"),
        first(col("__v")).as("__v"))
  }

  /** IVF-probed approximate top-k: score only same-cell pairs. Cells larger
    * than `maxCellSize` are dropped (same degeneracy guard as annLsh): a
    * dense cell under a 16-value join key would otherwise collapse
    * parallelism to one task and go quadratic on it.
    */
  def annIvf(df: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, maxCellSize: Int = 100000): DataFrame = {
    val cells = ivfCells(df, idCol, vecCol, nCells)
      .withColumn("__v", normalize(col("__v")))
      .withColumn("__csize",
        count(lit(1)).over(Window.partitionBy(col("cell"))))
      .filter(col("__csize") <= maxCellSize)
    val a = cells.select(col(idCol).as("q_id"), col("__v").as("q_vec"),
      col("cell"))
    val b = cells.select(col(idCol).as("n_id"), col("__v").as("n_vec"),
      col("cell"))
    val scored = a.join(b, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(expr("graft_dot(q_vec, n_vec)"), 4).as("sim4"))
    topKPerQuery(scored, k)
  }

  /** Per-vector LSH sketch assignment (narrow, shuffle-free). */
  def sketched(df: DataFrame, idCol: String, vecCol: String, nBits: Int = 8): DataFrame =
    df.withColumn("bucket", lshBucket(col(vecCol), nBits))

  /** Approximate top-k: score only same-bucket pairs. */
  def annLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 8,
      maxBucketSize: Int = 10000): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val s = sketched(df, idCol, vecCol, nBits)
      .select(col(idCol), normalize(col(vecCol)).as(vecCol), col("bucket"))
    val bounded = s.withColumn("bsize",
      count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .filter(col("bsize") <= maxBucketSize)
    val a = bounded.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      col("bucket"))
    val b = bounded.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      col("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim4").desc, col("n_id"))
    a.join(b, "bucket")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(expr("graft_dot(q_vec, n_vec)"), 4).as("sim4"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }
}
