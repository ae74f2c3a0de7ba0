package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.asDouble

/** IVF+PQ compound ANN ([EXT]): the production composition of the two
  * index halves this engine already ships separately — a coarse quantizer
  * routes every vector to an inverted-list cell ([[Similarity.annIvfMd5]]'s
  * contract), and the RESIDUAL against that cell's centroid is product-
  * quantized into `m` small codes ([[Pq]]'s contract). A query probes its
  * `nProbe` nearest cells and scores candidates by asymmetric distance:
  *
  *   score(q, x) ≈ dot(q, cellCentroid) + Σⱼ dot(qⱼ, codebookⱼ(codeⱼ))
  *
  * — the inner product decomposed as coarse term + residual LUT lookups,
  * so a candidate costs one per-(query, cell) scalar plus `m` table reads
  * and NO access to the original vector.
  *
  * Why this is the 100 TB shape: IVF alone keeps full vectors in its lists
  * (the verify pass re-reads every candidate's 64 doubles); PQ alone scans
  * the WHOLE code table per query (no routing). Composed, a 100 TB vector
  * corpus becomes ~2 TB of (cell, codes) rows, the probe set touches
  * `nProbe/nCells` of it, and the scan never rehydrates an embedding —
  * residual quantization also centers each cell's distribution at the
  * origin, so the shared codebooks spend their 2^bits resolution on the
  * local spread instead of the global layout (the FAISS IVFADC design).
  *
  * Determinism contract (every step reuses a proven cross-engine piece):
  *  - cell assignment/probe order: `graft_ivf_cells` — round-6 cosine,
  *    (sim6 DESC, cell ASC), the q_ann_ivf_md5 contract;
  *  - residual: exact element-wise double subtraction (`graft_residual`,
  *    replayed by DuckDB `list_transform` — bit-identical inputs to the
  *    code argmax on both engines);
  *  - codebook fit/assignment: [[Pq]] verbatim over the residual frame
  *    (round-6 cosine argmax, ties to the smaller code; fitted codebooks
  *    embed as value-exact literals in the oracle);
  *  - ADC fold: fixed order `w + (((l0 + l1) + l2) + … )`, LUT terms and
  *    the coarse term w round-6 BEFORE the fold, final score round-4,
  *    top-k ties to the smaller neighbor id.
  *
  * Scale shape: the index build is one narrow codegen pass (assign →
  * residual → argmax, zero shuffles). The query side is gated + broadcast
  * carrying per-query LUTs (m·k rounded dots) and one coarse term per
  * probed cell; the code table streams; the only post-scoring exchange is
  * the bounded `graft_topk` partial aggregate at O(queries × k).
  */
object IvfPq {

  /** (idCol, cell, __v, __rv): coarse assignment + residual per vector —
    * the shared first stage of fit/index (one definition, codegen end to
    * end: the sorted-cells kernel feeds the residual kernel).
    */
  private def withResidual(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]]): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val centStr = coarse.map(_.mkString(",")).mkString(";")
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("cell",
        element_at(call_function("graft_ivf_cells", col("__v"), lit(centStr)),
          1).getField("c"))
      .withColumn("__rv",
        call_function("graft_residual", col("__v"), lit(centStr), col("cell")))
  }

  /** Residual codebooks under the given coarse centroids — [[Pq.fit]] on
    * the residual frame (same md5 seed draw over the ids, same Lloyd
    * rounds; `centroids(j)(c)` = codeword `c` of residual subspace `j`).
    */
  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]],
      m: Int,
      k: Int,
      iters: Int): Array[Array[Array[Double]]] =
    Pq.fit(withResidual(df, idCol, vecCol, coarse), idCol, "__rv",
      m, k, iters)

  /** The compound index: (idCol, cell, codes array<long>) — one compact
    * row per vector, the only thing the query path ever scans.
    */
  def index(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    Pq.codesKeeping(withResidual(df, idCol, vecCol, coarse), idCol, "__rv",
      codebooks, Seq("cell"))

  /** Exploded index for oracle comparison: (idCol, cell, subspace, code) —
    * derived from [[index]] (one assignment definition; the [[Pq.encode]]
    * review lesson).
    */
  def encode(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    index(df, idCol, vecCol, coarse, codebooks)
      .select(col(idCol), col("cell"),
        posexplode(col("codes")).as(Seq("__j", "code")))
      .select(col(idCol), col("cell"),
        col("__j").cast("long").as("subspace"), col("code"))

  /** ADC top-k over the probed cells. Output (q_id, n_id, adc4, rn); the
    * query's own row is excluded. The broadcast rows widen by an
    * m·k-double LUT each (the [[Pq.annPq]] byte cap applies) plus the
    * nProbe fan-out; the code-table side never shuffles.
    */
  def annIvfPq(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      k: Int,
      nProbe: Int = 2,
      maxQueryRows: Long = 100000L): DataFrame = {
    // validate BEFORE the broadcast gate spends a Spark job on the probe
    // side (review finding: a bad k should fail instantly)
    require(k >= 1, s"k must be positive, got $k")
    val probes = probeFrame(queries, idCol, vecCol, coarse, codebooks,
      nProbe, maxQueryRows)
    val idx = Similarity.spreadIfNarrow(
      index(corpus, idCol, vecCol, coarse, codebooks)
        .select(col(idCol).as("n_id"), col("cell"),
          col("codes").as("__codes")))
    adcTopK(probes, idx, codebooks.length, k)
  }

  /** The gated broadcast-side probe frame — (q_id, cell, w6, __luts), one
    * row per (query, probed cell): the ONE definition of the query half,
    * shared by the in-memory [[annIvfPq]] and the persisted
    * [[queryPersisted]] so the two paths cannot drift.
    */
  private def probeFrame(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nProbe: Int,
      maxQueryRows: Long): DataFrame = {
    require(nProbe >= 1 && nProbe <= coarse.length,
      s"nProbe out of [1, ${coarse.length}]: $nProbe")
    graft.plans.GraftFunctions.register(queries.sparkSession)
    val m = codebooks.length
    val sub = codebooks.head.head.length
    // __luts attaches BEFORE the probe explode, so the broadcast carries
    // nProbe copies of each query's m·k LUT — the byte cap divides by the
    // fan-out too (review finding: annPq's formula alone under-gates by
    // up to nCells×); Pq.lutBroadcastRowCap denominates in BYTES (the
    // round-15 unit fix — the previous form divided by a double count)
    val lutDoubles = m.toLong * codebooks.head.length
    val effectiveCap =
      Pq.lutBroadcastRowCap(maxQueryRows, lutDoubles, nProbe.toLong)
    Similarity.requireBroadcastable(queries, effectiveCap,
      s"IvfPq query side (each row carries a $lutDoubles-double LUT " +
        s"and fans out $nProbe probe cells)",
      "batched query slices")
    val centStr = coarse.map(_.mkString(",")).mkString(";")
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    // per-query LUT over the RESIDUAL codebooks: luts[j][c] =
    // round6(dot(q_j, codebook_{j,c})) — the query stays un-residualized
    // (asymmetric: dot(q, cell + r̂) = dot(q, cell) + dot(q, r̂))
    val luts = array((0 until m).map { j =>
      array(codebooks(j).indices.map { c =>
        round(call_function("graft_dot",
          slice(col("__qv"), j * sub + 1, sub),
          typedLit(codebooks(j)(c).toSeq)), 6)
      }: _*)
    }: _*)
    queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("__qv"))
      .withColumn("__cells",
        call_function("graft_ivf_cells", col("__qv"), lit(centStr)))
      .withColumn("__luts", luts)
      .select(col("q_id"), col("__luts"), col("__qv"),
        explode(slice(col("__cells"), 1, nProbe)).as("p"))
      .withColumn("cell", col("p").getField("c"))
      // the coarse half of the decomposed inner product, one scalar per
      // (query, probed cell), rounded like the LUT terms
      .withColumn("w6", round(call_function("graft_dot", col("__qv"),
        element_at(coarseLit, col("cell").cast("int") + 1)), 6))
      .select(col("q_id"), col("cell"), col("w6"), col("__luts"))
  }

  /** Score + elect: the fixed-order ADC fold over the probe/index join and
    * the bounded top-k — the shared back half of both query paths.
    * `idx` must be (n_id, cell, __codes).
    */
  private def adcTopK(probes: DataFrame, idx: DataFrame, m: Int,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val adc = (0 until m).map(j =>
      element_at(element_at(col("__luts"), j + 1),
        col("__codes")(j).cast("int") + 1)).reduce(_ + _)
    // a vector lives in exactly one cell and the probe cells are distinct,
    // so (q_id, n_id) pairs are unique on a clean index — graft_topk's
    // distinct-id election matches a row_number window bit for bit. An
    // [[appendPersisted]] crash-window duplicate row breaks the
    // uniqueness but NOT the election: the duplicate carries the same
    // codes, hence the same adc4, and the heap keeps one entry per
    // distinct id (spec-pinned query invariance)
    val scored = idx.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(col("w6") + adc, 4).as("sim4"))
    Similarity.topKPerQuery(scored, k).withColumnRenamed("sim4", "adc4")
  }

  /** The models sidecar's table name for a persisted compound index. */
  def modelsTableName(indexTable: String): String = indexTable + "__ivfpq"

  /** The tombstone sidecar's table name — pending logical deletes
    * ([[deletePersisted]]), applied physically and cleared by
    * [[compactPersisted]]. Same contract as
    * [[IncrementalAnn.tombstonesTableName]].
    */
  def tombstonesTableName(indexTable: String): String =
    indexTable + "__tombstones"

  /** Drop a persisted compound index and its sidecars, tables AND
    * storage dirs (the [[IncrementalAnn.dropIndex]] catalog-resolved
    * preamble, shared — not a fourth hand-built-path copy).
    */
  def dropPersisted(spark: org.apache.spark.sql.SparkSession,
      indexTable: String): Unit =
    Seq(indexTable, modelsTableName(indexTable),
        tombstonesTableName(indexTable))
      .foreach(IncrementalAnn.dropTableAndDir(spark, _))

  /** Persist the compound index: the (id, cell, codes) table bucketed by
    * `cell` (`coarse.length` buckets — one inverted list per bucket, the
    * [[IncrementalAnn]] layout) plus a one-row models sidecar carrying
    * both quantizers in the kernels' exact string serialization
    * (`Double.toString` shortest-round-trip, so a later
    * [[queryPersisted]] session reconstructs value-identical models).
    *
    * Lifecycle (round 15 — verdict r14 #1): this call is the BUILD (and
    * the re-train/REBUILD — rerunning it refits nothing but rewrites
    * both halves under the models it is given); [[appendPersisted]] is
    * the incremental ingest under the FROZEN models; [[codeDrift]] +
    * [[stalenessPolicy]] are the when-to-re-train signal. The in-memory
    * [[annIvfPq]] re-encodes its corpus per call — fine for one-shot
    * analytics, wrong at 100 TB.
    *
    * Crash ordering — correct for REBUILDS too (review finding: a
    * models-last write alone protects only the first build; a re-persist
    * crashing between the index overwrite and the sidecar overwrite
    * would leave NEW codes under the OLD quantizers, which
    * [[queryPersisted]] would score silently wrong — the exact
    * new-index/old-sidecar hazard [[IncrementalAnn.append]] documents):
    *   1. DROP the models sidecar (table + dir) — from here every reader
    *      fails closed with the repair instruction;
    *   2. overwrite the index table (self-healing a crashed prior
    *      overwrite's entry-less leftover dir first — the
    *      LOCATION_ALREADY_EXISTS window, so "rerun persistIndex"
    *      actually repairs);
    *   3. write the models sidecar — the COMMIT POINT: its existence
    *      asserts the pair is consistent, because it is only ever
    *      written immediately after the index it describes.
    * Coupled-pair rename-aside swaps and richer recovery are deliberately
    * NOT duplicated here (that machinery is [[IncrementalAnn.rebuild]]'s
    * contract for the uncompressed index): this rebuild is offline/
    * single-writer by the same contract, and the drop-sidecar-first
    * ordering above already fails every reader closed through the
    * window instead of pairing mismatched halves.
    */
  def persistIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      indexTable: String): Unit = {
    val spark = df.sparkSession
    val cells = coarse.length
    // clear a crashed compactPersisted's __rebuild/__old residue first —
    // this writer rewrites the index anyway, so rolling the swap back is
    // always the right repair here
    IncrementalAnn.recoverTable(spark, indexTable)
    IncrementalAnn.dropTableAndDir(spark, modelsTableName(indexTable))
    // writer self-heal: a crashed prior overwrite can leave the index dir
    // with no catalog entry; clear it so this (managed) create succeeds
    if (!spark.catalog.tableExists(indexTable))
      IncrementalAnn.dropTableAndDir(spark, indexTable)
    index(df, idCol, vecCol, coarse, codebooks)
      // one file per bucket: repartition(n, cell) is the same
      // murmur3-pmod mapping as the bucket id (the IncrementalAnn rule)
      .repartition(cells, col("cell"))
      .write.mode("overwrite")
      .bucketBy(cells, "cell").sortBy("cell")
      .saveAsTable(indexTable)
    import spark.implicits._
    Seq((coarse.map(_.mkString(",")).mkString(";"),
        codebooks.map(_.map(_.mkString(",")).mkString(";")).mkString("|")))
      .toDF("coarse", "codebooks")
      .write.mode("overwrite").saveAsTable(modelsTableName(indexTable))
    // a build/rebuild rewrites every row under the caller's authoritative
    // corpus, so pending tombstones are consumed by it (the
    // IncrementalAnn.rebuild rule) — cleared after the sidecar commit
    // point; a crash in between leaves tombstones naming ids the caller
    // either excluded (anti-join no-op) or re-added (suppressed until the
    // next compact, deleteIds' conservative contract)
    IncrementalAnn.dropTableAndDir(spark, tombstonesTableName(indexTable))
  }

  /** ADC top-k against a PERSISTED compound index — the 100 TB read path:
    * the scan touches only the PROBED buckets. The union of probed cells
    * across the query batch is bounded by nCells, so it collects
    * driver-side (one tiny job) and becomes an `isin` on the bucket
    * column — Spark prunes unprobed bucket FILES from the scan, which at
    * production cell counts means reading nProbe/nCells of the index
    * from storage instead of all of it. Scoring is [[annIvfPq]]'s own
    * probeFrame/adcTopK (shared code), so persisted ≡ in-memory results
    * bit for bit (spec-pinned).
    */
  def queryPersisted(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      indexTable: String,
      k: Int,
      nProbe: Int = 2,
      maxQueryRows: Long = 100000L,
      maxTombstones: Long = 1000000L,
      fitted: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] =
        None): DataFrame = {
    // `fitted` skips the sidecar read for callers chaining a query after
    // a persist/append (whose return value IS the sidecar content) — the
    // appendPersisted/IncrementalAnn.query trust contract (optimization
    // r16, guide §5: the bounded sidecar collect is two driver jobs a
    // chained caller otherwise pays per query for models it already
    // holds; IvfPqSpec pins fitted-path ≡ sidecar-path results). It must
    // be THIS index's models; when in doubt, omit it and pay the read.
    val spark = queries.sparkSession
    val (coarse, codebooks) = fitted.getOrElse(loadModels(spark, indexTable))
    require(k >= 1, s"k must be positive, got $k")
    // materialize the (gated, bounded) probe frame ONCE: both the
    // probed-cell collect below and the returned query plan consume it —
    // unmaterialized, each would re-run the per-query kernel pass and
    // the source scan (review finding; the checkpoint-what-is-consumed-
    // across-actions rule)
    val probes = probeFrame(queries, idCol, vecCol, coarse, codebooks,
      nProbe, maxQueryRows).localCheckpoint()
    // bounded ≤ nCells: the distinct probed cells ARE the bucket filter
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    // spreadIfNarrow: the pruned bucketed scan is task-per-bucket and
    // NON-splittable (the r13 lesson) — ≤ nProbe-of-few-cells buckets
    // would otherwise run the whole ADC scoring in that many tasks; the
    // round-robin spread is safe here because the join broadcasts the
    // PROBE side (the scan's bucket distribution is not what keeps the
    // index exchange-free — the broadcast join needs no partitioning)
    // pending tombstones anti-join AFTER the bucket prune (fewer rows to
    // filter) and BEFORE the ADC join — a deleted id must not occupy a
    // top-k slot. The gated tombstone set broadcasts against the pruned
    // scan (the IncrementalAnn.notTombstoned shape), so the no-shuffle
    // property of the index side survives.
    val pruned = spark.table(indexTable)
      .filter(col("cell").isin(probedCells: _*))
      .select(col(idCol).as("n_id"), col("cell"),
        col("codes").as("__codes"))
    val tombTable = tombstonesTableName(indexTable)
    val alive =
      if (spark.catalog.tableExists(tombTable)) {
        val tomb = spark.table(tombTable)
        Similarity.requireBroadcastable(tomb, maxTombstones,
          s"tombstone sidecar $tombTable (query-time deletes broadcast " +
            "against the pruned index scan)",
          "compactPersisted() — it applies the tombstones physically " +
            "and clears them")
        pruned.join(broadcast(tomb.select(col("id").as("__del"))),
          col("n_id") === col("__del"), "left_anti")
      } else pruned
    val idx = Similarity.spreadIfNarrow(alive)
    adcTopK(probes, idx, codebooks.length, k)
  }

  /** Exact-rerank refinement stage (the FAISS refine shape — round 15,
    * motivated by the rehearsal's own measurement): take a bounded ADC
    * candidate frame (q_id, n_id) and re-score ONLY those pairs with the
    * exact round-4 cosine from the original vectors, electing the final
    * (sim4 DESC, n_id ASC) top-k. This is the recall tool for the regime
    * the 100× leg measured — candidates whose ADC scores sit inside
    * quantization noise (near-tie siblings with near-zero residuals) —
    * while keeping the compressed index's scan economics: the corpus
    * vector table is touched only for queries × C candidate rows
    * (selective rehydration via a broadcast semi-style join; the corpus
    * NEVER shuffles or broadcasts), not for the full probe stream the
    * uncompressed verify pass would read.
    *
    * `candidates` is bounded by construction for every in-repo caller
    * (the ADC top-C of a gated query set: ≤ queries × C rows — both
    * factors capped upstream), but the method is public, so it fails
    * CLOSED on its own too (ADVICE r15): the pair frame is checkpointed —
    * one action the broadcast build would have executed anyway — and the
    * row-count gates run over the materialized blocks, so the fail-fast
    * costs two block-local counts, never a recompute of the ADC chain.
    */
  def refineExact(
      candidates: DataFrame,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxCandidateRows: Long = 1L << 21,
      maxQueryRows: Long = 100000L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    graft.plans.GraftFunctions.register(queries.sparkSession)
    // materialize the (narrow: two longs per row) pair frame once; the
    // gate, the broadcast build, and nothing else consume it
    val cand = candidates.select("q_id", "n_id").localCheckpoint()
    Similarity.requireBroadcastable(cand, maxCandidateRows,
      "refineExact candidate pairs (broadcast against the streaming " +
        "corpus scan for selective rehydration)",
      "a narrower ADC top-C (smaller c or a gated query batch)")
    Similarity.requireBroadcastable(queries, maxQueryRows,
      "refineExact query side (each row rehydrates its full vector " +
        "into the broadcast)",
      "batched query slices")
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("__qv"))
    val n = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("__nv"))
    // broadcast the BOUNDED candidate pairs against the streaming corpus
    // scan (the one-sided rule): only matching ids rehydrate
    val hydrated = n.join(broadcast(cand), Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        round(call_function("graft_cosine", col("__qv"), col("__nv")), 4)
          .as("sim4"))
    Similarity.topKPerQuery(hydrated, k)
  }

  /** ADC top-C → exact top-k: the refined compound query (in-memory
    * form). `c` is the refinement width — how many ADC candidates per
    * query get their exact cosine computed (c = k degenerates to a pure
    * re-scoring of the ADC set). Pick `c` from the measured
    * recall-vs-wall curve, not folklore: the rehearsal's `ivfpqp` leg
    * sweeps C ∈ {k, 2k, 8k, 64} at 10× and 100× and commits the curve
    * (SCALE_REHEARSAL.md §r16 — at 100× recall saturates well below
    * C=64 while the wall grows with the rehydration width).
    */
  def annIvfPqRefined(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      k: Int,
      c: Int,
      nProbe: Int = 2,
      maxQueryRows: Long = 100000L): DataFrame = {
    require(c >= k, s"refinement width c=$c must be >= k=$k")
    val cand = annIvfPq(queries, corpus, idCol, vecCol, coarse, codebooks,
      k = c, nProbe = nProbe, maxQueryRows = maxQueryRows)
    refineExact(cand, queries, corpus, idCol, vecCol, k)
  }

  /** [[annIvfPqRefined]] against a PERSISTED index: ADC top-C from the
    * pruned codes scan, exact rerank against `vectors` — the caller
    * names where the original vectors live (the source corpus table, or
    * an [[IncrementalAnn]] index's (id, vec) rows); the compound index
    * itself deliberately stores no vectors.
    */
  def queryPersistedRefined(
      queries: DataFrame,
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      indexTable: String,
      k: Int,
      c: Int,
      nProbe: Int = 2,
      maxQueryRows: Long = 100000L,
      fitted: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] =
        None): DataFrame = {
    require(c >= k, s"refinement width c=$c must be >= k=$k")
    val cand = queryPersisted(queries, idCol, vecCol, indexTable,
      k = c, nProbe = nProbe, maxQueryRows = maxQueryRows, fitted = fitted)
    refineExact(cand, queries, vectors, idCol, vecCol, k)
  }

  /** Bounded models-sidecar read: (coarse, codebooks), value-identical to
    * what [[persistIndex]] serialized (`Double.toString` shortest round
    * trip). Fails CLOSED with the repair instruction when the sidecar is
    * absent — its existence is the persist commit point, so a missing
    * sidecar means persistIndex (or a re-persist) did not complete.
    */
  def loadModels(spark: org.apache.spark.sql.SparkSession,
      indexTable: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val modelsTable = modelsTableName(indexTable)
    if (!spark.catalog.tableExists(modelsTable))
      throw new IllegalStateException(
        s"no models sidecar $modelsTable for index $indexTable — " +
          "persistIndex did not complete (the sidecar is its commit " +
          "point); rerun persistIndex to repair")
    val mr = spark.table(modelsTable).collect()
    require(mr.length == 1,
      s"models sidecar $modelsTable must hold exactly one row, " +
        s"got ${mr.length}")
    val coarse = mr.head.getString(0).split(';')
      .map(_.split(',').map(_.toDouble))
    val codebooks = mr.head.getString(1).split('|')
      .map(_.split(';').map(_.split(',').map(_.toDouble)))
    (coarse, codebooks)
  }

  /** Incremental append into a PERSISTED compound index (verdict r14 #1 —
    * the continuous-ingest lifecycle [[IncrementalAnn]] ships for the
    * uncompressed index, applied to the compressed codes table): encode
    * `batch` under the index's FROZEN coarse quantizer + residual
    * codebooks (read from the models sidecar, or `fitted`-chained) and
    * append its (id, cell, codes) rows — one file per bucket, the
    * [[IncrementalAnn.append]] small-files rule. Re-training either
    * quantizer remains an offline [[persistIndex]] rebuild, never an
    * append — the frozen-quantizer insert contract, which also makes the
    * whole chain deterministic: the spec + q_ann_ivfpq_incr_md5 oracle
    * pin
    *
    *   queryPersisted(persistIndex(A) then appendPersisted(B))
    *     ≡ queryPersisted(persistIndex(A ∪ B))  under the same models
    *
    * (sequential-composition parity, the q_ann_incr_md5 shape).
    *
    * Crash windows — a strictly SMALLER set than persistIndex/rebuild's,
    * because the sidecar is READ-ONLY here (the new-codes/old-models
    * hazard that forces persistIndex's drop-sidecar-first ordering cannot
    * occur on an append):
    *  - crash BEFORE the append's job commit: committed table content is
    *    unchanged (uncommitted task files live under the committer's
    *    temporary dirs, invisible to readers) — rerun the append;
    *  - crash AFTER the job commit but before the caller records success:
    *    a blind retry appends the batch TWICE — AT-LEAST-ONCE delivery,
    *    the same class as [[graft.streaming.StreamingAnnIngest]], and the
    *    same consequences: duplicates cost candidate-stream width only
    *    (the `graft_topk` election keeps one slot per distinct id), and
    *    the next [[persistIndex]] rebuild — which rewrites every row —
    *    is the designated reconciliation point. A caller needing
    *    effectively-once keeps a commit log keyed by batch id, exactly
    *    like the streaming ingest.
    *
    * `fitted` skips the sidecar read for callers chaining appends (its
    * value MUST be this index's models — the [[IncrementalAnn.append]]
    * trust contract; when in doubt, omit it and pay the bounded read).
    * Returns the models in force so the next call can chain them.
    *
    * At 100 TB: one narrow codegen encode pass over the BATCH (assign →
    * residual → fused code argmax, zero shuffles) plus one exchange on
    * `cell` for the bucketed write — cost proportional to the batch, not
    * the index it lands in (the flat-append property the rehearsal leg
    * gates).
    */
  def appendPersisted(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      indexTable: String,
      fitted: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] =
        None): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val spark = batch.sparkSession
    val models = fitted.getOrElse(loadModels(spark, indexTable))
    // the sidecar alone is not enough: append-mode saveAsTable CREATES a
    // missing table, which would silently stand up an index holding only
    // this batch under a sidecar describing the full corpus
    if (!spark.catalog.tableExists(indexTable))
      throw new IllegalStateException(
        s"index table $indexTable is missing — an append would silently " +
          "CREATE a batch-only index under models describing the full " +
          "corpus (inconsistent pair; a manual drop?); rerun " +
          "persistIndex to rebuild both")
    val (coarse, codebooks) = models
    index(batch, idCol, vecCol, coarse, codebooks)
      // one file per bucket per append: repartition(n, cell) is the same
      // murmur3-pmod mapping as the bucket id (the IncrementalAnn rule)
      .repartition(coarse.length, col("cell"))
      .write.mode("append")
      .bucketBy(coarse.length, "cell").sortBy("cell")
      .saveAsTable(indexTable)
    models
  }

  /** Logical delete from a persisted compound index ([EXT] — the takedown
    * path, [[IncrementalAnn.deleteIds]]' sibling for the codes table):
    * append the ids to the tombstone sidecar. Cost ∝ the delete batch
    * (one distinct + one tiny write); the bucketed codes table and the
    * models sidecar never move. [[queryPersisted]] suppresses tombstoned
    * ids from that moment (including rows appended after the delete —
    * the id is banned until a [[compactPersisted]]/[[persistIndex]]
    * clears the sidecar); idempotent and at-least-once for the same
    * reasons as the uncompressed form.
    */
  def deletePersisted(
      ids: DataFrame,
      idCol: String,
      indexTable: String): Unit = {
    val spark = ids.sparkSession
    IncrementalAnn.recoverTable(spark, indexTable)
    if (!spark.catalog.tableExists(indexTable))
      throw new IllegalStateException(
        s"index table $indexTable does not exist — nothing to delete " +
          "from (persistIndex first)")
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .coalesce(1)
      .write.mode("append")
      .saveAsTable(tombstonesTableName(indexTable))
  }

  /** Physical delete + GC for the persisted compound index
    * ([[IncrementalAnn.compact]]'s sibling): rewrite the codes table
    * WITHOUT tombstoned ids and without duplicate (cell, id) rows from
    * the at-least-once append window, under the UNTOUCHED models sidecar
    * (no re-encode — the codes are already what the frozen quantizers
    * say; re-training stays [[persistIndex]]'s job), then clear the
    * tombstone sidecar. Returns the surviving row count.
    *
    * Contract (spec + q_ann_ivfpq_del_md5 oracle):
    * delete + compact + query ≡ query over persistIndex(survivors) under
    * the same models, and ≡ the pre-compact tombstone-filtered query —
    * compaction changes no result, only reclaims space and removes the
    * per-query anti-join.
    *
    * Scale shape: one column-pruned bucketed scan (id, cell, codes — a
    * few bytes per row, never vectors) → un-hinted tombstone anti-join
    * (broadcasts when the tombstone set is small, shuffles gracefully on
    * a huge takedown batch) → per-(cell, id) keeper (exchange-free on
    * the bucketed layout: cell ⊆ the grouping keys) → bucketed write of
    * the SAME spec, one file per bucket. Crash windows: the single-table
    * rename-aside swap ([[IncrementalAnn.recoverTable]] rolls back, every
    * writer entry point runs it); a reader meanwhile sees either the old
    * complete pair (tombstones still filtering — identical answers) or
    * the new one. Tombstones drop after the swap; the in-between crash
    * leaves no-op tombstones the next compact clears.
    */
  def compactPersisted(spark: org.apache.spark.sql.SparkSession,
      indexTable: String,
      fitted: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] =
        None): Long = {
    IncrementalAnn.recoverTable(spark, indexTable)
    require(spark.catalog.tableExists(indexTable),
      s"compactPersisted needs an existing index $indexTable — " +
        "persistIndex first")
    // bucket count follows the models in force (sidecar read-only here);
    // loadModels also fails closed on a missing sidecar. `fitted` is the
    // queryPersisted chaining contract (the bucket count is all that is
    // read; wrong models here mean a wrong bucket spec, same severity).
    val (coarse, _) = fitted.getOrElse(loadModels(spark, indexTable))
    val cells = coarse.length
    val reb = indexTable + IncrementalAnn.RebuildSuffix
    IncrementalAnn.dropTableAndDir(spark, reb)
    val tombTable = tombstonesTableName(indexTable)
    val scan = spark.table(indexTable)
    // the id column keeps its caller-given name through persist/append
    // (the codesKeeping schema: id first, then cell, then codes)
    val idCol = scan.columns.head
    val live =
      if (spark.catalog.tableExists(tombTable))
        scan.join(spark.table(tombTable).select(col("id").as("__del")),
          col(idCol) === col("__del"), "left_anti")
      else scan
    // the audit count rides the rewrite job as an observe metric
    // (optimization r16, guide §5 — it used to be a second full scan of
    // the just-written table; the rewrite's own row count IS the
    // compacted table's count). Never statically empty (the observed
    // subtree is the full rewrite), so the metric always fulfills.
    val nObs = org.apache.spark.sql.Observation()
    live
      .groupBy(col("cell"), col(idCol))
      .agg(first(col("codes")).as("codes"))
      .select(col(idCol), col("cell"), col("codes"))
      .observe(nObs, count(lit(1)).as("n"))
      .repartition(cells, col("cell"))
      .write.mode("overwrite")
      .bucketBy(cells, "cell").sortBy("cell")
      .saveAsTable(reb)
    IncrementalAnn.swapIn(spark, indexTable)
    IncrementalAnn.dropTableAndDir(spark, tombTable)
    nObs.get("n").asInstanceOf[Long]
  }

  /** Quantization-staleness report for the CODE space (verdict r14 #1's
    * policy half — the [[IncrementalAnn.quantizerDrift]] sibling for the
    * compressed index): per-(subspace, code) PSI between the persisted
    * index's code histogram and a new batch's codes under the same frozen
    * codebooks. A batch whose residual distribution has drifted away from
    * what the codebooks were trained on concentrates into few codes per
    * subspace, degrading ADC resolution — the signal that the next
    * [[persistIndex]] should re-train, which no cell-level signal sees
    * (the COARSE drift stays [[IncrementalAnn.quantizerDrift]]'s job).
    *
    * Cost at 100 TB: one column-pruned scan of the index's `codes` column
    * (a few bytes per row — never the vectors), one narrow encode pass
    * over the batch, and ≤ m·k-row joins. Epsilon/round-6 per-row PSI
    * mirrors [[IncrementalAnn.cellDrift]] with per-SUBSPACE totals.
    */
  def codeDrift(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      indexTable: String,
      fitted: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] =
        None): DataFrame = {
    val spark = batch.sparkSession
    val (coarse, codebooks) = fitted.getOrElse(loadModels(spark, indexTable))
    codeDriftFrames(spark.table(indexTable).select(col("codes")),
      batch, idCol, vecCol, coarse, codebooks)
  }

  /** [[codeDrift]] over FRAMES: `indexCodes` is any frame carrying the
    * index's `codes` column (the table scan, or an [[index]] result for
    * catalog-free callers — the q_ivfpq_code_drift oracle surface).
    * Output: (subspace, code, n_index, n_batch, psi6), ≤ m·k rows.
    */
  def codeDriftFrames(
      indexCodes: DataFrame,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    def hist(codes: DataFrame, n: String): DataFrame =
      codes.select(posexplode(col("codes")).as(Seq("__j", "__c")))
        .groupBy(col("__j").cast("long").as("subspace"),
          col("__c").as("code"))
        .agg(count(lit(1)).as(n))
    val p = hist(indexCodes.select(col("codes")), "n_index")
    val c = hist(
      index(batch, idCol, vecCol, coarse, codebooks).select(col("codes")),
      "n_batch")
    // tiny (≤ m·k rows) joined frame, materialized once; per-SUBSPACE
    // totals (each vector contributes exactly one code per subspace, so
    // every subspace's total is the row count — computing them per
    // subspace keeps the fold self-contained and oracle-replayable);
    // same epsilon floor / round-6 contract as cellDrift
    val joined = p.join(c, Seq("subspace", "code"), "full_outer")
      .select(col("subspace"), col("code"),
        coalesce(col("n_index"), lit(0L)).as("n_index"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"))
      .localCheckpoint()
    val eps = lit(1e-6)
    val pr = greatest(col("n_index") / col("__ti"), eps)
    val qr = greatest(col("n_batch") / col("__tb"), eps)
    joined
      .join(broadcast(joined.groupBy(col("subspace")).agg(
          sum(col("n_index")).as("__ti"), sum(col("n_batch")).as("__tb"))),
        Seq("subspace"))
      .select(col("subspace"), col("code"), col("n_index"), col("n_batch"),
        round((pr - qr) * log(pr / qr), 6).as("psi6"))
  }

  /** Maintenance decision for the code space (the
    * [[IncrementalAnn.maintenancePolicy]] sibling): fold a [[codeDrift]]
    * frame into one row —
    *  - `m_subspaces`, `n_index_rows`, `n_batch_rows` (identical across
    *    subspaces by construction: one code per vector per subspace);
    *  - `max_psi_micro` = the WORST subspace's PSI in exact integer
    *    micro-units (per-code round-6 contributions become integers and
    *    both the per-subspace sum and the max are associative — the
    *    maintenancePolicy cross-engine lesson); the max, not the mean:
    *    one collapsed subspace wrecks ADC resolution even when the
    *    others are healthy;
    *  - `stale` = max_psi_micro > psiThreshold (default 0.25, the PSI
    *    working rule) — re-train via [[persistIndex]]; appends under
    *    stale codebooks stay CORRECT (ADC scores whatever the codes
    *    say), they just quantize coarsely.
    * No cap/list signal on purpose: codes have no inverted lists — the
    * cell histogram stays the coarse policy's job. Everything is exact
    * integer arithmetic over ≤ m·k rows, so the whole decision is
    * hash-oracled (q_ivfpq_policy).
    */
  def stalenessPolicy(
      drift: DataFrame,
      psiThreshold: Double = 0.25): DataFrame = {
    val psiMicroThreshold = math.round(psiThreshold * 1e6)
    drift
      .groupBy(col("subspace"))
      .agg(
        sum(col("n_index")).as("__ti"),
        sum(col("n_batch")).as("__tb"),
        sum(round(col("psi6") * 1e6).cast("long")).as("__psi"))
      .agg(
        count(lit(1)).as("m_subspaces"),
        max(col("__ti")).as("n_index_rows"),
        max(col("__tb")).as("n_batch_rows"),
        max(col("__psi")).as("max_psi_micro"))
      .withColumn("stale",
        (col("max_psi_micro") > psiMicroThreshold).cast("long"))
  }
}
