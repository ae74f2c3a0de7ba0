package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the composed pipelines (VERDICT r4 item 6): run
  * `Curation.curate` and `TrainingPipeline.run` on an N× salted blowup of
  * an sf dir and report wall time, peak storage-memory in use, and
  * convergence — validating that the documented persist lifecycle spills
  * (MEMORY_AND_DISK) instead of OOMing and that connected components
  * converges within maxIter (CC throws if it does not, so completion IS
  * the convergence check).
  *
  * The blowup unions N copies with shifted ids and a per-copy salt token
  * appended to the text: copies are NOT exact duplicates (exact dedup
  * keeps them) but ARE near-duplicates of each other, so the near-dup
  * stage faces size-N clusters — the worst realistic shape for the
  * banded LSH + verify + CC chain, at N× the corpus volume.
  *
  * Usage: runMain graft.ScaleRehearsal [sfDir] [blowup] [outDir] [legs]
  * `legs` is a comma list filtering which legs run (curate, pipeline,
  * spans, heavy, entropy, winnow, vector, iann, ivfpqp, events, dq,
  * delta, skew); default "all". Prints one JSON line, mirroring the
  * Bench contract.
  */
object ScaleRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val blowup = if (args.length > 1) args(1).toInt else 10
    val outDir = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("graft-scale").toString
    val legSel: Set[String] =
      if (args.length > 3)
        args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set("all")
    def on(leg: String): Boolean = legSel("all") || legSel(leg)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ADVICE r11: register graft functions at session bootstrap so a
    // Column built while another (or no) session was active still
    // resolves the graft_* kernels when analyzed against THIS session
    graft.plans.GraftFunctions.register(spark)

    val docs0 = graft.sources.Tables.table(spark, sfDir, "documents")
    val blown = (0 until blowup).map { k =>
      docs0.select(
        (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" copysalt$k")).as("text"),
        col("lang"), col("source"))
    }.reduce(_.union(_))
    val nIn = blown.count()

    // sample peak storage-memory in use across executors while running
    @volatile var peakCache = 0L
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val inUse = spark.sparkContext.statusTracker.getExecutorInfos
          .map(_.cacheSize()).sum
        if (inUse > peakCache) peakCache = inUse
        Thread.sleep(250)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val cfg = graft.operators.Curation.Config(
      maxStopRatio = 1.0, transitiveNearDups = true)
    // eval slice: ~30 docs SPREAD across the id space, bounded in
    // absolute size. Both naive shapes proved vacuous somewhere (the
    // templated fixture shares shingles broadly, so decontamination
    // scales with eval size): a flat limit(50) contaminated ALL of the
    // sf0.01 base (train_docs=0 at 30×), and the scale-proportional
    // %17 slice (~300 docs at sf0.1) contaminated ALL of sf0.1. The
    // curate leg's non-vacuity gate below now guards both regressions.
    // orderBy before the limit (ADVICE r11): an unordered limit(30) picks
    // whatever 30 rows the scan delivers first, so the decontamination
    // input — and hence survivor counts — could drift across runs or
    // partitionings of the same fixture; TakeOrderedAndProject keeps the
    // slice cheap and reproducible
    val eval = docs0.filter(col("doc_id") % 17 === 0)
      .orderBy(col("doc_id")).limit(30)
      .select(col("doc_id"), col("text"))

    // plain Double interpolation (the Bench contract): an f"%.1f" render
    // is default-locale-dependent and a comma-decimal locale would emit
    // invalid JSON
    def r1(x: Double): Double = math.round(x * 10.0) / 10.0

    val curateJson = if (!on("curate")) "" else {
      // 1× baseline first, then the blowup, with the vector-leg
      // sublinearity gate: a quadratic candidate regression in the
      // LSH/verify/CC chain lands at ~N× the 1× wall and trips this
      // immediately; +2.0 s absolute slack for sub-second 1× walls on a
      // host with ~1.7× hour-scale speed variance
      val t1x = System.nanoTime()
      val (tr1, te1) = graft.operators.Curation.curate(
        docs0, "doc_id", "text", "lang", cfg, Some(eval))
      val n1 = tr1.count() + te1.count()
      val w1 = (System.nanoTime() - t1x) / 1e9
      require(n1 > 0,
        "curate leg is vacuous: zero 1× survivors — every downstream " +
          "assert would pass on empty frames")
      val t0 = System.nanoTime()
      val (train, test) = graft.operators.Curation.curate(
        blown, "doc_id", "text", "lang", cfg, Some(eval))
      val nTrain = train.count(); val nTest = test.count()
      val tCurate = (System.nanoTime() - t0) / 1e9
      require(tCurate <= 0.7 * blowup * w1 + 2.0,
        f"curate wall superlinear at $blowup×: $tCurate%.1f s vs $w1%.1f s at 1×")
      // every blowup copy of a kept base doc is a near-dup cluster of
      // size ~N collapsing to ONE keeper, so survivors must stay in the
      // same order as the 1× survivor count, not N×
      require(nTrain + nTest <= 2L * n1 + 100L,
        s"transitive near-dup keepers leaked at $blowup×: " +
          s"${nTrain + nTest} survivors vs $n1 at 1×")
      s""","curate_sec":${r1(tCurate)},"curate_sec_1x":${r1(w1)},""" +
        s""""train_docs":$nTrain,"test_docs":$nTest,""" +
        s""""curate_survivors_1x":$n1,"cc_converged":true"""
    }

    val pipelineJson = if (!on("pipeline")) "" else {
      val t1 = System.nanoTime()
      val res = graft.processes.TrainingPipeline.run(
        blown, "doc_id", "text", "lang", cfg,
        numMerges = 100, budget = 2048, nShards = 8,
        outPath = s"$outDir/shards")
      val tPipeline = (System.nanoTime() - t1) / 1e9
      s""","pipeline_sec":${r1(tPipeline)},""" +
        s""""pipeline_train_docs":${res.trainDocs},""" +
        s""""train_bins":${res.trainBins}"""
    }

    // round-5 heavy operators at the same blowup: the span seed join
    // (df-capped pairing over 10× the seed stream — the salt token
    // breaks up runs, so spans come from genuine overlap, and shared
    // grams sit at 10× their base df, stressing the cap) and the CMS
    // heavy-hitter pass over ~10× the token stream
    val spansJson = if (!on("spans")) "" else {
      val t2 = System.nanoTime()
      val nSpanPairs = graft.operators.SpanDedup.sharedSpans(
        blown, "text", "doc_id", l = 5, minSpan = 8, maxDf = 50).count()
      val tSpans = (System.nanoTime() - t2) / 1e9
      s""","spans_sec":${r1(tSpans)},"span_pairs":$nSpanPairs"""
    }
    val heavyJson = if (!on("heavy")) "" else {
      val t3 = System.nanoTime()
      val nHeavy = graft.operators.HeavyHitters.heavyTokens(
        blown, "text", minCount = 40L * blowup).count()
      val tHeavy = (System.nanoTime() - t3) / 1e9
      s""","heavy_sec":${r1(tHeavy)},"heavy_tokens":$nHeavy"""
    }

    // round-9 second-half leg: the new aggregation-bearing operators at
    // the same blowup — char-bigram entropy explodes ~one row per corpus
    // CHARACTER before its (doc, gram) count exchange, and the winnowing
    // overlap screen faces every fingerprint at blowup× its base df (the
    // cap drops boilerplate families; the salted copies' genuine overlap
    // must still surface, asserted non-empty)
    val entropyJson = if (!on("entropy")) "" else {
      val t4 = System.nanoTime()
      val nEnt = graft.operators.TextAnalysis.charBigramEntropy(
        blown, "text", "doc_id").count()
      val tEnt = (System.nanoTime() - t4) / 1e9
      s""","entropy_sec":${r1(tEnt)},"entropy_docs":$nEnt"""
    }
    val winnowJson = if (!on("winnow")) "" else {
      val t5 = System.nanoTime()
      // maxDf scales with the blowup (like heavyTokens' minCount and
      // sharedSpans' maxDf): each copy family's genuine shared
      // fingerprints sit at df >= blowup, and the default cap of 20
      // would drop ALL of them past blowup 20 — leaving only incidental
      // pairs and tripping the non-empty assert below
      val nOverlap = graft.operators.Dedup.winnowOverlapPairs(
        blown, "text", "doc_id", maxDf = math.max(20, 2 * blowup)).count()
      val tOverlap = (System.nanoTime() - t5) / 1e9
      require(nOverlap > 0,
        "winnow overlap found no pairs in a corpus of near-copies")
      s""","winnow_sec":${r1(tOverlap)},"winnow_pairs":$nOverlap"""
    }

    val vectorJson = if (on("vector")) vectorLeg(spark, sfDir, blowup) else ""
    val iannJson = if (on("iann")) iannLeg(spark, sfDir, blowup) else ""
    val ivfpqpJson = if (on("ivfpqp")) ivfPqPersistedLeg(spark, sfDir, blowup)
      else ""
    val eventsJson = if (on("events")) eventsLeg(spark, sfDir, blowup) else ""
    val dqJson = if (on("dq")) dqLeg(spark, docs0, blown, blowup) else ""
    val deltaJson = if (on("delta")) deltaLeg(spark, docs0, blowup, cfg) else ""
    val skewJson = if (on("skew")) skewLeg(spark, docs0, blowup) else ""
    sampling = false

    println(
      s"""{"metric":"scale_rehearsal","sf":"$sfDir","blowup":$blowup,""" +
      s""""rows_in":$nIn,"peak_cache_bytes":$peakCache""" +
      curateJson + pipelineJson + spansJson + heavyJson + entropyJson +
      winnowJson + vectorJson + iannJson + ivfpqpJson + eventsJson +
      dqJson + deltaJson + skewJson + "}")
    spark.stop()
  }

  /** Vector/ANN rehearsal at the blowup (round-9 verdict #2: the one
    * 100 TB operator family with no blowup evidence). The embeddings
    * table is blown up N× with shifted ids and a deterministic one-
    * dimension perturbation per copy (copies are near-neighbors of each
    * other, not exact duplicates — exact ties would make top-k recall
    * ill-defined), then each ANN surface runs at 1× and at N× with the
    * registry's own parameters. Asserted in-run (a green line IS the
    * proof, like the delta leg):
    *  (a) no broadcast/size gate trips at N× (the gates throw);
    *  (b) wall stays sublinear: wall(N×) ≤ 0.7 · N · wall(1×) for each
    *      of annLsh / annIvf / annPq / bitextMine — a quadratic
    *      candidate blowup (bucket-cap or salt regression) blows
    *      through this immediately (it would be ~N× the 1× wall);
    *  (c) recall@3 vs the exact sampled baseline HOLDS at N× at the
    *      sf0.1 spec floors (lsh 0.015 / ivf 0.13 / pq 0.018): the
    *      sketches must keep grouping the near-copy clusters when every
    *      bucket holds N× the vectors.
    */
  private def vectorLeg(spark: SparkSession, sfDir: String,
      blowup: Int): String = {
    import graft.operators.{Pq, Similarity}
    val e0 = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val dim = e0.select(size(col("embedding"))).head.getInt(0)
    def blow(df: org.apache.spark.sql.DataFrame, n: Int) =
      (0 until n).map { k =>
        df.select((col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === lit(k % dim), x + lit(0.001f * (k + 1)))
              .otherwise(x)).as("embedding"),
          col("label"))
      }.reduce(_.union(_))
    // materialize both scales once so the timed runs measure the
    // operators, not the union/perturb setup
    val base = blow(e0, 1).localCheckpoint()
    val blown = blow(e0, blowup).localCheckpoint()
    val nVec = blown.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def annCount(df: org.apache.spark.sql.DataFrame): Long = {
      def run() = Seq(
        Similarity.annLsh(df, "vec_id", "embedding", k = 3).count(),
        Similarity.annIvf(df, "vec_id", "embedding", k = 3).count(),
        Pq.annPq(df, df, "vec_id", "embedding",
          Pq.fit(df, "vec_id", "embedding", m = 4, k = 8, iters = 2),
          k = 3).count(),
        Similarity.bitextMine(df.filter(col("vec_id") % 2 === 0),
          df.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4).count()).sum
      run()
    }
    val (wall1, n1) = timed(annCount(base))
    val (wallN, nN) = timed(annCount(blown))
    require(n1 > 0 && nN > 0, "ANN rehearsal produced no rows")
    // +2.0 s absolute slack like dqLeg/eventsLeg: sub-second 1× walls on
    // a host with ~1.7× hour-scale speed variance would otherwise trip
    // the gate spuriously after one unlucky-fast 1× run
    require(wallN <= 0.7 * blowup * wall1 + 2.0,
      f"ANN wall superlinear at $blowup×: $wallN%.1f s vs $wall1%.1f s " +
        "at 1× — a candidate-set blowup got past the bucket caps")

    // recall@3 at N× on a deterministic query sample vs the exact
    // brute-force baseline (sampled so the baseline stays O(sample·N·n))
    val sample = blown.filter(col("vec_id") % 53 === 0).localCheckpoint()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampleIds = sample.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = pairs(Similarity.knnBruteForce(
      sample, blown, "vec_id", "embedding", 3))
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = pairs(ann).filter(p => sampleIds.contains(p._1))
      got.intersect(exact).size.toDouble / exact.size
    }
    val rLsh = recallOf(Similarity.annLsh(blown, "vec_id", "embedding", 3))
    val rIvf = recallOf(Similarity.annIvf(blown, "vec_id", "embedding", 3))
    val rPq = recallOf(Pq.annPq(blown, blown, "vec_id", "embedding",
      Pq.fit(blown, "vec_id", "embedding", m = 4, k = 8, iters = 2), k = 3))
    require(rLsh >= 0.015, f"lsh recall@3 $rLsh%.4f under floor at $blowup×")
    require(rIvf >= 0.13, f"ivf recall@3 $rIvf%.4f under floor at $blowup×")
    require(rPq >= 0.018, f"pq recall@3 $rPq%.4f under floor at $blowup×")

    // IVF+PQ compound (round 14): the composed index at blowup. Timed per
    // scale: BOTH quantizer fits (index-build cost is part of the story),
    // the full compound encode, and the ADC query for a deterministic
    // query subset (vec_id % 40 — the registry shape; a corpus-sized
    // broadcast probe set is the IncrementalAnn leg's story, and this
    // operator's gate would rightly refuse it). Same sublinear gate as
    // the flat surfaces; recall on the sampled baseline must HOLD at N×
    // with cell routing discarding 6 of 8 cells per query.
    import graft.operators.{Clustering, IvfPq}
    def ivfPqModels(df: org.apache.spark.sql.DataFrame) = {
      val coarse = Clustering.kmeansFit(df, "vec_id", "embedding",
        k = 8, iters = 2)
      (coarse, IvfPq.fit(df, "vec_id", "embedding", coarse,
        m = 4, k = 8, iters = 2))
    }
    // the timed closure keeps its last models so the recall pass below
    // reuses the blown-scale fits instead of paying a third full fit
    // pass over the 10× frame (review finding)
    var lastModels: (Array[Array[Double]], Array[Array[Array[Double]]]) = null
    def ivfPqCount(df: org.apache.spark.sql.DataFrame): Long = {
      val (coarse, cbs) = ivfPqModels(df)
      lastModels = (coarse, cbs)
      IvfPq.index(df, "vec_id", "embedding", coarse, cbs).count() +
        IvfPq.annIvfPq(df.filter(col("vec_id") % 40 === 0), df,
          "vec_id", "embedding", coarse, cbs, k = 3, nProbe = 2).count()
    }
    val (ipWall1, ipN1) = timed(ivfPqCount(base))
    val (ipWallN, ipNN) = timed(ivfPqCount(blown))
    require(ipN1 > 0 && ipNN > 0, "IVF+PQ rehearsal produced no rows")
    require(ipWallN <= 0.7 * blowup * ipWall1 + 2.0,
      f"IVF+PQ wall superlinear at $blowup×: $ipWallN%.1f s vs " +
        f"$ipWall1%.1f s at 1×")
    val (coarseN, cbsN) = lastModels
    val rIvfPq = recallOf(IvfPq.annIvfPq(sample, blown, "vec_id",
      "embedding", coarseN, cbsN, k = 3, nProbe = 2))
    // floor = the IvfPqSpec sf0.001 floor (the lsh/ivf/pq convention:
    // spec floors, not blowup-measured values); measured 0.8992 at 10× —
    // ABOVE flat PQ's 0.7454 in the same run, the residual-quantization
    // accuracy claim demonstrated at blowup
    require(rIvfPq >= 0.05,
      f"ivfpq recall@3 $rIvfPq%.4f under floor at $blowup×")

    def r1(x: Double): Double = math.round(x * 10.0) / 10.0
    def r4(x: Double): Double = math.round(x * 10000.0) / 10000.0
    s""","vec_rows":$nVec,"vec_wall_1x":${r1(wall1)}""" +
      s""","vec_wall_${blowup}x":${r1(wallN)}""" +
      s""","vec_recall_lsh":${r4(rLsh)},"vec_recall_ivf":${r4(rIvf)}""" +
      s""","vec_recall_pq":${r4(rPq)}""" +
      s""","ivfpq_wall_1x":${r1(ipWall1)}""" +
      s""","ivfpq_wall_${blowup}x":${r1(ipWallN)}""" +
      s""","vec_recall_ivfpq":${r4(rIvfPq)}"""
  }

  /** Incremental-ANN rehearsal at the blowup: the 100 TB claim for the
    * persisted vector index ([[graft.operators.IncrementalAnn]]) is that
    * an APPEND costs work proportional to the BATCH — one narrow
    * assignment pass + one bucketed write — not to the index it lands in.
    * Copy 0 bootstraps the index (fit + sidecar + first append); copies
    * 1..N−1 then append ONE AT A TIME, so the index under the last append
    * is (N−1)× bigger than under the first. Asserted in-run:
    *  (a) per-append wall stays FLAT as the index grows — the last
    *      append ≤ 1.5 × the first + 2 s absolute slack (an append that
    *      re-read or re-shuffled the index would scale with N and blow
    *      through this);
    *  (b) the final index holds exactly N × the batch rows (nothing
    *      dropped, nothing double-written);
    *  (c) probe recall@3 vs the exact brute-force baseline on a sampled
    *      query set holds the IVF-family floor — the frozen bootstrap
    *      quantizer must keep placing each copy's perturbed
    *      near-neighbors in probed cells as the corpus grows N×.
    */
  /** Delete/compact rehearsal sub-leg (verdict r15 #1), shared by the
    * uncompressed and compressed index legs so the two lifecycles are
    * gated identically: tombstone the `vec_id % 10 == 3` slice (the
    * copy-id shift is a multiple of 10, so the slice is ~10% of every
    * copy), then gate — on whatever index state the leg ends in —
    *  (a) no deleted id surfaces in any post-delete result (tombstone
    *      read path);
    *  (b) queries whose pre-delete top-k held NO deleted id keep
    *      IDENTICAL results (removing corpus rows cannot change a top-k
    *      they never occupied — an exact invariant, no second
    *      brute-force pass needed);
    *  (c) compaction shrinks the table by exactly the deleted row count
    *      and clears the tombstone sidecar;
    *  (d) the post-compact query equals the tombstone-path query bit for
    *      bit and its wall stays within noise of the pre-delete wall.
    */
  private def deleteCompactSubLeg(
      spark: SparkSession,
      table: String,
      tombTable: String,
      idColName: String,
      delIds: org.apache.spark.sql.DataFrame,
      query: () => Set[(Long, Long)],
      delete: org.apache.spark.sql.DataFrame => Unit,
      compact: () => Long,
      prefix: String): String = {
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def r1(x: Double): Double = math.round(x * 10.0) / 10.0
    val (wQ0, q0) = timed(query())
    val nBefore = spark.table(table).count()
    val nDel = spark.table(table)
      .filter(col(idColName) % 10 === 3).count()
    require(nDel > 0L, s"$prefix delete slice is empty — the sub-leg " +
      "would gate nothing")
    val (wDelete, _) = timed(delete(delIds))
    val (wTombQ, q1) = timed(query())
    require(q1.forall(_._2 % 10 != 3),
      s"a deleted id surfaced in $prefix post-delete results")
    val clean = q0.groupBy(_._1)
      .collect { case (q, ps) if ps.forall(_._2 % 10 != 3) => q }.toSet
    require(clean.nonEmpty,
      s"$prefix invariance gate vacuous: every query's top-k touched " +
        "the deleted slice")
    require(q0.filter(p => clean(p._1)) == q1.filter(p => clean(p._1)),
      s"$prefix queries untouched by the delete changed results")
    val (wCompact, nAfter) = timed(compact())
    require(nAfter == nBefore - nDel,
      s"$prefix compaction kept $nAfter rows, expected " +
        s"${nBefore - nDel} ($nBefore - $nDel deleted)")
    require(!spark.catalog.tableExists(tombTable),
      s"$prefix compaction left the tombstone sidecar standing")
    val (wCompQ, q2) = timed(query())
    require(q2 == q1,
      s"$prefix compaction changed query results at blowup")
    require(wCompQ <= 1.5 * wQ0 + 2.0,
      f"$prefix post-compact query slower than pre-delete: " +
        f"$wCompQ%.1f s vs $wQ0%.1f s")
    s""","${prefix}_delete_sec":${r1(wDelete)}""" +
      s""","${prefix}_tomb_query_sec":${r1(wTombQ)}""" +
      s""","${prefix}_compact_sec":${r1(wCompact)}""" +
      s""","${prefix}_query_postcompact_sec":${r1(wCompQ)}""" +
      s""","${prefix}_rows_postcompact":$nAfter"""
  }

  private def iannLeg(spark: SparkSession, sfDir: String,
      blowup: Int): String = {
    import graft.operators.{IncrementalAnn, Similarity}
    // appendWalls.head below and the staleness copies(1) probe both
    // need at least one non-bootstrap copy (ADVICE r15 — fail with the
    // precondition, not a NoSuchElementException)
    require(blowup >= 2, "iann leg needs at least one append copy " +
      s"(blowup >= 2), got $blowup")
    val e0 = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val dim = e0.select(size(col("embedding"))).head.getInt(0)
    def copy(k: Int) = e0.select(
      (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === lit(k % dim), x + lit(0.001f * (k + 1)))
          .otherwise(x)).as("embedding"))
      .localCheckpoint()
    val table = "iann_rehearsal"
    IncrementalAnn.dropIndex(spark, table)
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val copies = (0 until blowup).map(copy)
    val (wBoot, cents) = timed(
      IncrementalAnn.append(copies(0), "vec_id", "embedding", table))
    val appendWalls = (1 until blowup).map { k =>
      timed(IncrementalAnn.append(copies(k), "vec_id", "embedding", table,
        fitted = Some(cents)))._1
    }
    val (wFirst, wLast) = (appendWalls.head, appendWalls.last)
    require(wLast <= 1.5 * wFirst + 2.0,
      f"incremental-ANN append grew with the index: first $wFirst%.2f s " +
        f"vs last $wLast%.2f s under a ${blowup - 1}x bigger index")
    val nBatch = e0.filter(col("embedding").isNotNull).count()
    val nIdx = spark.table(table).count()
    require(nIdx == blowup * nBatch,
      s"index holds $nIdx rows, expected ${blowup * nBatch}")
    // recall@3 on a sampled query set vs the exact brute-force baseline
    // over the SAME union corpus the index holds
    val all = copies.reduce(_.union(_)).localCheckpoint()
    val sample = all.filter(col("vec_id") % 53 === 0).localCheckpoint()
    val sampleIds = sample.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.knnBruteForce(
        sample, all, "vec_id", "embedding", 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // maxCellSize scales with the corpus: the default 10000 cap exists to
    // fail closed on DEGENERATE fits, and at 100× a healthy 8-cell index
    // legitimately holds ~25k rows per cell — first observed as recall 0.0
    // when the gate (correctly) excluded every cell. A real deployment at
    // this growth point rebuilds with more cells (exactly the signal
    // quantizerDrift/list sizes raise); the leg keeps nCells fixed to keep
    // the flat-append claim comparable across blowups.
    // scaled cap, shared by the timed query and the corpus-probe sub-leg
    // (one definition so the two sites cannot desynchronize); clamped
    // before the narrowing cast (ADVICE r13): past ~8.6B rows 2L*nIdx/8
    // wraps negative as an Int and math.max would silently fall back to
    // 10000, re-tripping the cap gate at extreme blowups
    val scaledCap = math.min(Int.MaxValue.toLong,
      math.max(10000L, 2L * nIdx / 8)).toInt
    val (wQuery, got) = timed(
      IncrementalAnn.query(sample, "vec_id", "embedding", table, k = 3,
        maxCellSize = scaledCap,
        fitted = Some(cents),
        // caller-asserted small probe set (nIdx/53 rows): the %53 filter
        // inherits the checkpointed union's UNREDUCED stats, which would
        // spuriously trip the gate into the nCells-task shuffle regime
        probeBroadcastBytes = 1L << 30)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val recall = got.filter(p => sampleIds.contains(p._1))
      .intersect(exact).size.toDouble / exact.size
    require(recall >= 0.13,
      f"incremental-ANN recall@3 $recall%.4f under the IVF floor at $blowup×")
    def r1(x: Double): Double = math.round(x * 10.0) / 10.0
    def r4(x: Double): Double = math.round(x * 10000.0) / 10000.0
    // Corpus-sized probe sub-leg (verdict r13 #1): self-query the WHOLE
    // union corpus against the index and gate, on the EXECUTED plan, that
    // the large side never broadcast and the bucketed index never
    // shuffled — the regime the probe-size gate exists for. The byte
    // threshold is scaled to the miniature fixture (the standing
    // rehearsal practice, like maxCellSize above): 8 MB puts this
    // corpus-sized probe set (≥ 30× the base table) in the shuffle
    // regime while the sampled query set above stays broadcast — the
    // same ratio the production 32 MB default draws at real scale.
    val probeJson =
      if (blowup < 30 || blowup >= 50) ""
      // (not at ≥50×: pre-rebuild the oversized 8-cell lists make a
      // corpus self-probe ~10^10 verify pairs — the regime the policy
      // rebuild below exists to fix; the no-broadcast property is
      // join-shape-invariant, demonstrated at the verdict's 30×)
      else {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
        import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec}
        val dfBig = IncrementalAnn.query(all, "vec_id", "embedding", table,
          k = 3, maxCellSize = scaledCap,
          fitted = Some(cents), probeBroadcastBytes = 8L << 20)
        // collect() on THIS df — count()/head() would plan a separate
        // QueryExecution, leaving the inspected plan unexecuted (the
        // round-13 skew-leg lesson); queries × k rows ≈ 3·nIdx, tens of
        // MB at 100×, bounded by construction
        val (wProbeAll, nProbeRows) = timed(dfBig.collect().length.toLong)
        require(nProbeRows > 0L, "corpus-sized probe returned no rows")
        // walk the ADAPTIVE executed plan through its materialized stages
        def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
          case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
          case q: QueryStageExec => allNodes(q.plan)
          case other => other.children.flatMap(allNodes)
        })
        val nodes = allNodes(dfBig.queryExecution.executedPlan)
        val bcasts = nodes.collect { case b: BroadcastExchangeExec => b }
        require(bcasts.nonEmpty, "expected the okCells broadcast")
        bcasts.foreach { b =>
          require(allNodes(b).collect { case g: GenerateExec => g }.isEmpty,
            s"the corpus-sized probe side was BROADCAST at $blowup×:\n$b")
        }
        // "the index never shuffles" = no exchange between the index scan
        // and the join; the walk stops at aggregate boundaries (rows past
        // a partial agg are bounded topk buffers / okCells counts, not
        // index rows — the IncrementalAnnSpec gate's rule)
        import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
        def belowNoAgg(p: SparkPlan): Seq[SparkPlan] = p match {
          case _: BaseAggregateExec => Seq.empty
          case a: AdaptiveSparkPlanExec => p +: belowNoAgg(a.executedPlan)
          case q: QueryStageExec => p +: belowNoAgg(q.plan)
          case other => other +: other.children.flatMap(belowNoAgg)
        }
        nodes.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
          require(e.children.flatMap(belowNoAgg).collect {
            case f: FileSourceScanExec
                if f.tableIdentifier.exists(
                  _.table.equalsIgnoreCase(table)) => f
          }.isEmpty,
            s"the bucketed index moved through an exchange at $blowup×:\n$e")
        }
        s""","iann_probe_all_sec":${r1(wProbeAll)}""" +
          s""","iann_probe_all_rows":$nProbeRows"""
      }
    // Maintenance is POLICY-driven (verdict r13 #3): consult
    // maintenancePolicy with the PRODUCTION cap (10000 — the scaled cap
    // above exists only so the flat-append gate's query can run) and the
    // most recent ingest batch as the drift probe. At ≥ 50× healthy
    // growth trips the list cap (the 100× first attempt measured ~25k-row
    // lists) and the policy demands a rebuild, recommending the cell
    // count the round-13 leg hard-coded by hand (total/5000 → pow2 = 64
    // at 100×); below that the policy must stay quiet.
    val polRow = IncrementalAnn.maintenancePolicy(
      IncrementalAnn.quantizerDrift(copies.last, "vec_id", "embedding",
        table, fitted = Some(cents)),
      nCells = cents.length, maxCellSize = 10000L).collect().head
    val polRebuild = polRow.getAs[Long]("rebuild")
    val polCells = polRow.getAs[Long]("recommended_cells")
    val polJson =
      s""","iann_policy_rebuild":$polRebuild""" +
        s""","iann_policy_cells":$polCells""" +
        s""","iann_policy_max_list":${polRow.getAs[Long]("max_list")}""" +
        s""","iann_policy_psi_micro":${polRow.getAs[Long]("psi_micro")}"""
    // Decision cross-check against the DATA's own shape, not the blowup
    // number (review finding r14: `blowup >= 50` hard-coded the sf0.1
    // fixture's row count — any other sfDir, a documented CLI arg, would
    // fail the leg even when the policy decided correctly). The average
    // list size is an INDEPENDENT estimator of the cap signal (the
    // policy reads max_list), so this is a genuine cross-check with a
    // dead band for the avg<cap<max boundary zone where either decision
    // is defensible.
    val avgList = nIdx.toDouble / cents.length
    if (avgList > 12000.0)
      require(polRebuild == 1L,
        s"maintenancePolicy stayed quiet with average lists at $avgList " +
          s"rows against cap 10000 at $blowup×")
    else if (avgList < 8000.0)
      require(polRebuild == 0L,
        s"maintenancePolicy demanded a rebuild with average lists at " +
          s"$avgList rows against cap 10000 at $blowup× (psi_micro " +
          s"${polRow.getAs[Long]("psi_micro")} — an in-distribution " +
          "uniform blowup must not trip the drift flag)")
    // The rebuild the policy demands, exercised THROUGH the policy's own
    // recommendation: refit at its cell count, rewrite, re-query. Gates:
    // recall holds, and the query gets decisively faster (probing 2 of
    // `polCells` small lists instead of 2 of 8 oversized ones).
    val rebuildJson =
      if (polRebuild != 1L) ""
      else {
        val (wRebuild, cents2) = timed(IncrementalAnn.rebuild(
          all, "vec_id", "embedding", table, nCells = polCells.toInt))
        val (wQuery2, got2) = timed(
          IncrementalAnn.query(sample, "vec_id", "embedding", table, k = 3,
            fitted = Some(cents2),
            // caller-asserted small probe set — see the wQuery site
            probeBroadcastBytes = 1L << 30)
            .select("q_id", "n_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet)
        val recall2 = got2.filter(p => sampleIds.contains(p._1))
          .intersect(exact).size.toDouble / exact.size
        require(recall2 >= 0.13,
          f"post-rebuild recall@3 $recall2%.4f under the floor at $blowup×")
        require(wQuery2 <= 0.75 * wQuery,
          f"rebuild to $polCells cells did not speed the oversized-list " +
            f"query: $wQuery2%.1f s vs $wQuery%.1f s")
        s""","iann_rebuild_sec":${r1(wRebuild)}""" +
          s""","iann_query_rebuilt_sec":${r1(wQuery2)}""" +
          s""","iann_recall_rebuilt":${r4(recall2)}"""
      }
    // delete/compact lifecycle on whatever state the leg ends in (the
    // policy branch may have rebuilt at polCells — the sub-leg reads the
    // sidecar quantizer through query either way)
    val delJson = deleteCompactSubLeg(spark, table,
      IncrementalAnn.tombstonesTableName(table), idColName = "id",
      delIds = all.filter(col("vec_id") % 10 === 3).select(col("vec_id")),
      query = () => IncrementalAnn.query(sample, "vec_id", "embedding",
          table, k = 3, maxCellSize = scaledCap,
          probeBroadcastBytes = 1L << 30)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      delete = ids => IncrementalAnn.deleteIds(ids, "vec_id", table),
      compact = () => IncrementalAnn.compact(spark, table),
      prefix = "iann")
    s""","iann_rows":$nIdx,"iann_boot_sec":${r1(wBoot)}""" +
      s""","iann_append_first_sec":${r1(wFirst)}""" +
      s""","iann_append_last_sec":${r1(wLast)}""" +
      s""","iann_query_sec":${r1(wQuery)},"iann_recall":${r4(recall)}""" +
      probeJson + polJson + rebuildJson + delJson
  }

  /** Persisted IVF+PQ compound-index rehearsal at the blowup (verdict r14
    * #5 + the #1 append path): the 100 TB claims of the COMPRESSED index
    * lifecycle, asserted in-run (a green line IS the proof):
    *  (a) [[graft.operators.IvfPq.appendPersisted]] costs work
    *      proportional to the BATCH, not the index it lands in — copy 0
    *      persists the bucketed codes table under models fitted on
    *      itself (the frozen-quantizer contract), copies 1..N−1 append
    *      one at a time, and the LAST append (index (N−1)× bigger) must
    *      stay ≤ 1.5 × the first + 2 s absolute slack;
    *  (b) the final codes table holds exactly N × the batch rows
    *      (nothing dropped, nothing double-written);
    *  (c) queryPersisted recall@3 on a sampled query set vs the exact
    *      brute-force baseline holds the compound floor (the IvfPqSpec
    *      sf0.001 floor, the family convention) with 2-of-8 cell routing
    *      over an N×-bigger corpus;
    *  (d) the probed-cell bucket PRUNING is real on the EXECUTED plan: a
    *      single-query probe's index scan reads ≤ nProbe of the nCells
    *      buckets (`optionalBucketSet`), so at production cell counts
    *      the read path touches nProbe/nCells of the index, not all
    *      of it;
    *  (e) the code-space staleness policy
    *      ([[graft.operators.IvfPq.stalenessPolicy]]) stays QUIET under
    *      the in-distribution blowup (an essentially-identical
    *      perturbed-copy batch must not demand a re-train) — its
    *      max-subspace PSI is recorded as the signal's healthy reading.
    */
  private def ivfPqPersistedLeg(spark: SparkSession, sfDir: String,
      blowup: Int): String = {
    import graft.operators.{Clustering, IvfPq, Similarity}
    // appendWalls.head and the staleness copies(1) probe need at least
    // one non-bootstrap copy (ADVICE r15)
    require(blowup >= 2, "ivfpqp leg needs at least one append copy " +
      s"(blowup >= 2), got $blowup")
    val e0 = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val dim = e0.select(size(col("embedding"))).head.getInt(0)
    def copy(k: Int) = e0.select(
      (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === lit(k % dim), x + lit(0.001f * (k + 1)))
          .otherwise(x)).as("embedding"))
      .localCheckpoint()
    val table = "ivfpqp_rehearsal"
    IvfPq.dropPersisted(spark, table)
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val copies = (0 until blowup).map(copy)
    // both quantizer fits are once-per-index-generation work (the
    // registry's memoized-fit discipline) — timed separately from the
    // appends whose flatness is the claim under test
    val (wFit, models) = timed {
      val coarse = Clustering.kmeansFit(copies(0), "vec_id", "embedding",
        k = 8, iters = 2)
      (coarse, IvfPq.fit(copies(0), "vec_id", "embedding", coarse,
        m = 4, k = 8, iters = 2))
    }
    val (wPersist, _) = timed(IvfPq.persistIndex(copies(0), "vec_id",
      "embedding", models._1, models._2, table))
    val appendWalls = (1 until blowup).map { k =>
      timed(IvfPq.appendPersisted(copies(k), "vec_id", "embedding", table,
        fitted = Some(models)))._1
    }
    val (wFirst, wLast) = (appendWalls.head, appendWalls.last)
    require(wLast <= 1.5 * wFirst + 2.0,
      f"persisted-compound append grew with the index: first $wFirst%.2f " +
        f"s vs last $wLast%.2f s under a ${blowup - 1}x bigger index")
    val nBatch = e0.filter(col("embedding").isNotNull).count()
    val nIdx = spark.table(table).count()
    require(nIdx == blowup * nBatch,
      s"codes table holds $nIdx rows, expected ${blowup * nBatch}")
    // recall@3 on a sampled query set vs the exact brute-force baseline
    // over the SAME union corpus the index compresses
    val all = copies.reduce(_.union(_)).localCheckpoint()
    val sample = all.filter(col("vec_id") % 53 === 0).localCheckpoint()
    val sampleIds = sample.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.knnBruteForce(
        sample, all, "vec_id", "embedding", 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (wQuery, got) = timed(
      IvfPq.queryPersisted(sample, "vec_id", "embedding", table, k = 3,
        nProbe = 2)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val recall = got.filter(p => sampleIds.contains(p._1))
      .intersect(exact).size.toDouble / exact.size
    require(recall >= 0.05,
      f"persisted IVF+PQ recall@3 $recall%.4f under the compound floor " +
        f"at $blowup×")
    // bucket-pruned-scan evidence on the EXECUTED plan (the IvfPqSpec
    // gate, re-proven at blowup): one query probes exactly nProbe cells,
    // so the index scan's bucket set must shrink to ≤ 2 of the 8 buckets
    val one = IvfPq.queryPersisted(all.filter(col("vec_id") === 0L),
      "vec_id", "embedding", table, k = 3, nProbe = 2)
    // collect() on THIS df — a separate action would plan its own
    // QueryExecution and leave the inspected plan unexecuted
    require(one.collect().nonEmpty, "single-query probe returned no rows")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    })
    val scans = allNodes(one.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(
            _.table.equalsIgnoreCase(table)) => f
    }
    require(scans.nonEmpty, "no index scan found in the probed plan")
    scans.foreach { f =>
      val sel = f.optionalBucketSet.map(_.cardinality())
      require(sel.exists(_ <= 2),
        s"index scan read ${sel.getOrElse("ALL")} of 8 buckets at " +
          s"$blowup× — bucket pruning regressed")
    }
    // Refine-width curve (verdict r15 #4): C is the refine stage's one
    // dial, and r15 picked C=64 from a single sitting — measure the
    // recall-vs-wall trade at C ∈ {k, 2k, 8k, 64} against the
    // as-appended index at BOTH blowups so a deployment picks C from
    // data. Gate per point: the exact re-election of an ADC top-C
    // superset can never lose recall vs plain ADC (small tolerance for
    // tie reshuffles at equal round-4 scores); the curve itself is the
    // committed value, not a pass/fail claim.
    def r1e(x: Double): Double = math.round(x * 10.0) / 10.0
    def r4e(x: Double): Double = math.round(x * 10000.0) / 10000.0
    val refineCurveJson = Seq(3, 6, 24, 64).map { c =>
      val (wC, gotC) = timed(
        IvfPq.queryPersistedRefined(sample, all, "vec_id", "embedding",
          table, k = 3, c = c, nProbe = 2)
          .select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
      val recallC = gotC.filter(p => sampleIds.contains(p._1))
        .intersect(exact).size.toDouble / exact.size
      require(recallC >= recall - 0.02,
        f"refine C=$c recall $recallC%.4f fell below the plain ADC " +
          f"reading $recall%.4f at $blowup×")
      s""","ivfpqp_refine_c${c}_sec":${r1e(wC)}""" +
        s""","ivfpqp_refine_c${c}_recall":${r4e(recallC)}"""
    }.mkString
    // code-space staleness: the GATE reads the minimally-perturbed copy
    // (one dimension +0.002 — unambiguously in-distribution; the policy
    // must stay quiet), and the MOST-perturbed copy's reading is
    // recorded un-gated as the signal's drifting-edge value (at 100× its
    // single-dim shift reaches +0.1 — whether that crosses 0.25 PSI is a
    // data property worth committing, not a pass/fail claim)
    def psiOf(batch: org.apache.spark.sql.DataFrame) =
      IvfPq.stalenessPolicy(IvfPq.codeDrift(batch,
        "vec_id", "embedding", table, fitted = Some(models)))
        .collect().head
    val staleRow = psiOf(copies(1))
    require(staleRow.getAs[Long]("stale") == 0L,
      s"stalenessPolicy demanded a re-train under an in-distribution " +
        s"batch (max_psi_micro ${staleRow.getAs[Long]("max_psi_micro")})")
    val edgeRow = psiOf(copies.last)
    def r1(x: Double): Double = math.round(x * 10.0) / 10.0
    def r4(x: Double): Double = math.round(x * 10000.0) / 10000.0
    // CAPACITY close (the r14 iann 100× lifecycle applied to the
    // compressed index): recall slides as fixed cells fill — and it is
    // the COARSE policy that sees it (the cell histogram vs the
    // production cap; the code-space signal correctly stays quiet —
    // capacity is not drift). When the policy demands a rebuild, the
    // re-train for THIS index is persistIndex at its recommended cell
    // count (fresh coarse fit + residual codebooks on the union), and
    // the gates are the iann leg's: recall holds the floor, the query
    // gets decisively faster (probing 2 of `recommended` small cells
    // instead of 2 of 8 saturated ones).
    val pol = graft.operators.IncrementalAnn.maintenancePolicy(
      graft.operators.IncrementalAnn.cellDrift(
        spark.table(table).select(col("cell")),
        copies.last, "vec_id", "embedding", models._1),
      nCells = models._1.length, maxCellSize = 10000L).collect().head
    val polRebuild = pol.getAs[Long]("rebuild")
    val polCells = pol.getAs[Long]("recommended_cells")
    val polJson =
      s""","ivfpqp_coarse_rebuild":$polRebuild""" +
        s""","ivfpqp_coarse_cells":$polCells""" +
        s""","ivfpqp_coarse_max_list":${pol.getAs[Long]("max_list")}"""
    val retrainJson =
      if (polRebuild != 1L) ""
      else {
        def queryRecall(nProbe: Int): (Double, Double) = {
          val (w, got) = timed(
            IvfPq.queryPersisted(sample, "vec_id", "embedding", table,
              k = 3, nProbe = nProbe)
              .select("q_id", "n_id").collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSet)
          (w, got.filter(p => sampleIds.contains(p._1))
            .intersect(exact).size.toDouble / exact.size)
        }
        val t0 = System.nanoTime()
        val coarse2 = Clustering.kmeansFit(all, "vec_id", "embedding",
          k = polCells.toInt, iters = 2)
        IvfPq.persistIndex(all, "vec_id", "embedding", coarse2,
          IvfPq.fit(all, "vec_id", "embedding", coarse2,
            m = 4, k = 8, iters = 2),
          table)
        val wRetrain = (System.nanoTime() - t0) / 1e9
        val (wQuery2, recall2) = queryRecall(2)
        require(recall2 >= 0.05,
          f"post-re-train recall@3 $recall2%.4f under the floor")
        require(wQuery2 <= 0.75 * wQuery,
          f"re-train to $polCells cells did not speed the saturated " +
            f"query: $wQuery2%.1f s vs $wQuery%.1f s")
        // recall attribution, both dials MEASURED (floor-gated, values
        // committed — the 100× runs refuted BOTH comfortable
        // hypotheses): (a) coverage — query at the coverage-MATCHED
        // nProbe (nProbe × polCells / nCells = the saturated index's
        // 25% of the corpus): recall does NOT move (0.4715 vs 0.4722
        // at nProbe=2) — not coverage-bound; (b) code budget —
        // re-encode under the SAME retrained coarse with m=8 (2× code
        // bytes): recall DROPS to 0.2765 — more, smaller subspaces
        // carry LESS direction signal per spherical code. Diagnosis:
        // this fixture's true top-3 are sibling copies whose residuals
        // against a PURE cell are near zero, so their ADC scores sit
        // inside the quantization noise floor — the saturated 8-cell
        // index read HIGHER recall (0.5579) only because its residuals
        // were larger and carried more signal. The operator guidance
        // this leg validates: past saturation, the coarse re-train
        // buys the wall (13→3 s); when candidates are near-ties the
        // recall tool is the EXACT-verify index (IncrementalAnn reads
        // 0.998 at this same scale in its own leg), not more code
        // bytes — the documented compressed-vs-exact regime split.
        val npMatched = math.max(2,
          (2L * polCells / models._1.length).toInt)
        val (wQueryM, recallM) = queryRecall(npMatched)
        require(recallM >= 0.05,
          f"coverage-matched recall $recallM%.4f under the floor")
        // (c) the refine stage — the dial that DOES move recall in the
        // near-tie regime (round-15 operator, motivated by (a)+(b)):
        // ADC top-64 from the retrained compressed index, then ONLY
        // those ≤ 64-per-query candidates rehydrate vectors for the
        // exact rerank. Gate: refined recall must at least hold the
        // unrefined retrained reading (it re-elects from a superset by
        // exact score); the measured recovery is the committed value.
        val (wRefine, gotR) = timed(
          IvfPq.queryPersistedRefined(sample, all, "vec_id", "embedding",
            table, k = 3, c = 64, nProbe = 2)
            .select("q_id", "n_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet)
        val recallR = gotR.filter(p => sampleIds.contains(p._1))
          .intersect(exact).size.toDouble / exact.size
        require(recallR >= recall2 - 0.02,
          f"refined recall $recallR%.4f fell below the unrefined " +
            f"retrained reading $recall2%.4f")
        val (wRefit8, _) = timed(
          IvfPq.persistIndex(all, "vec_id", "embedding", coarse2,
            IvfPq.fit(all, "vec_id", "embedding", coarse2,
              m = 8, k = 8, iters = 2),
            table))
        val (wQuery8, recall8) = queryRecall(2)
        require(recall8 >= 0.05,
          f"m=8 recall $recall8%.4f under the floor")
        s""","ivfpqp_retrain_sec":${r1(wRetrain)}""" +
          s""","ivfpqp_query_retrained_sec":${r1(wQuery2)}""" +
          s""","ivfpqp_recall_retrained":${r4(recall2)}""" +
          s""","ivfpqp_nprobe_matched":$npMatched""" +
          s""","ivfpqp_query_matched_sec":${r1(wQueryM)}""" +
          s""","ivfpqp_recall_matched":${r4(recallM)}""" +
          s""","ivfpqp_query_refined_sec":${r1(wRefine)}""" +
          s""","ivfpqp_recall_refined":${r4(recallR)}""" +
          s""","ivfpqp_refit_m8_sec":${r1(wRefit8)}""" +
          s""","ivfpqp_query_m8_sec":${r1(wQuery8)}""" +
          s""","ivfpqp_recall_m8":${r4(recall8)}"""
      }
    // delete/compact lifecycle on whatever state the leg ends in (the
    // retrain branch may have re-persisted — the sub-leg reads the
    // sidecar models through queryPersisted either way)
    val delJson = deleteCompactSubLeg(spark, table,
      IvfPq.tombstonesTableName(table), idColName = "vec_id",
      delIds = all.filter(col("vec_id") % 10 === 3).select(col("vec_id")),
      query = () => IvfPq.queryPersisted(sample, "vec_id", "embedding",
          table, k = 3, nProbe = 2)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      delete = ids => IvfPq.deletePersisted(ids, "vec_id", table),
      compact = () => IvfPq.compactPersisted(spark, table),
      prefix = "ivfpqp")
    s""","ivfpqp_rows":$nIdx,"ivfpqp_fit_sec":${r1(wFit)}""" +
      s""","ivfpqp_persist_sec":${r1(wPersist)}""" +
      s""","ivfpqp_append_first_sec":${r1(wFirst)}""" +
      s""","ivfpqp_append_last_sec":${r1(wLast)}""" +
      s""","ivfpqp_query_sec":${r1(wQuery)}""" +
      s""","ivfpqp_recall":${r4(recall)}""" +
      s""","ivfpqp_psi_micro":${staleRow.getAs[Long]("max_psi_micro")}""" +
      s""","ivfpqp_stale":${staleRow.getAs[Long]("stale")}""" +
      s""","ivfpqp_psi_micro_edge":${edgeRow.getAs[Long]("max_psi_micro")}""" +
      refineCurveJson + polJson + retrainJson + delJson
  }

  /** Data-quality rehearsal at the blowup: constraint-audit RATES are
    * scale-free for per-row checks over columns the blowup copies
    * verbatim (completeness / value-set / regex — NOT length-based
    * checks, the copysalt suffix shifts lengths, and NOT distinctness),
    * so every metric_micro must be EXACTLY equal at N× — an exact
    * invariant, like the events leg: a partial-aggregation bug, an
    * overflow in the micro arithmetic, or a row-dropping scan defect
    * all break the equality.
    */
  /** Skewed-join rehearsal (round-11 verdict item 4; rebuilt round 13 so
    * the gates BIND — verdict r12 #3 + ADVICE r12): every other leg blows
    * data up ~uniformly, but the reference's real join shape is a
    * provider-keyed fact stream where ONE hub holds a disproportionate
    * share (the `groupBy(provider)` exchanges behind MqReports.scala:
    * 93-111 — hubs span orders of magnitude). This leg builds that
    * shape — hub0 owns 40% of rows (`doc_id % 10 < 4`, invariant under
    * the id shift since the blowup stride is a multiple of 10), a ~500-
    * provider tail owns the rest. Each doc fans out ×200 on the fact
    * side, carrying an incompressible-ish per-row payload (without one,
    * the provider-only shuffle of 1M rows lz4-compressed to 391 KB and
    * AQE *coalesced the whole fact side into one partition* — the r12
    * fixture was invisible to the byte-based skew detector), and joins a
    * 800-rows-per-provider dim with broadcast DISABLED (at 100 TB the dim
    * does not broadcast; the shuffle join is the regime being rehearsed).
    * At blowup 10 / sf0.1 the join emits 8×10⁹ rows and the plain wall is
    * ~5 s — measured signal, not slack. Both mitigation paths run at 1×
    * and N×:
    *  - plain shuffle join under AQE's skew-join split, with the split
    *    thresholds scaled to the fixture (256 KB skew threshold / 128 KB
    *    advisory) the same way broadcast is disabled: hub0's ~20 MB
    *    compressed partition must present the same RELATIVE skew a 100 TB
    *    hub partition presents against the 256 MB default;
    *  - [[graft.operators.SkewJoin.saltedInnerJoin]], 8 salt buckets.
    * In-run gates (a green line IS the proof, like the other legs):
    *  (a) both paths agree bit-exactly at N× (row count + both payload
    *    sums);
    *  (b) the salted wall stays sublinear: ≤ 0.7·N·wall(1×) + a slack
    *    PROPORTIONAL to wall(1×) (0.25·wall1, floored at 0.3 s), not the
    *    old flat +2 s that dwarfed a 0.3 s fixture — measured round 13:
    *    slack ≈ 0.6 s ≈ 9% of the ~7 s salted N× wall, and the bound
    *    sits ~2.7× above the measured wall, so a salting regression that
    *    replicates the FACT side across buckets (~8×) or a quadratic
    *    candidate blowup (~10× linear) both trip it decisively;
    *  (c) AQE actually SPLIT the skewed partition on the plain N× join
    *    (sum of numSkewedPartitions over the executed plan ≥ 1) — this
    *    distinguishes "AQE handled the skew" from "the box was fast
    *    enough to hide it". Measured round 13: 1 skewed partition split
    *    10 ways, and the split plain join BEAT the salted path (4.6 vs
    *    6.7 s) — the operator guidance this leg exists to validate;
    *  (d) `Profiling.joinSkewReport` names hub0 as the top key with
    *    ≥30% estimated-output share — the histogram an operator would
    *    consult BEFORE choosing to salt.
    * Wall-clock gate (b) carries [[HostLoad]] contention evidence
    * (ADVICE r12): each timed window records external-core usage, and a
    * failing gate re-measures the salted pair once before hard-failing,
    * so a co-tenant burst on this ~1.7×-swinging host cannot fail the
    * leg spuriously; the failure message carries the ext-core figures of
    * both attempts. All aggs run via collect() — head() would plan a
    * SEPARATE limited QueryExecution, leaving the inspected plan's
    * metrics at zero (observed round 13).
    */
  private def skewLeg(spark: SparkSession,
      docs0: org.apache.spark.sql.DataFrame, blowup: Int): String = {
    val factFan = 200L
    val attrs = 800L
    def withProvider(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      explode(sequence(lit(0L), lit(factFan - 1))).as("f"),
      when(col("doc_id") % 10 < 4, lit("hub0"))
        .otherwise(concat(lit("p"), (col("doc_id") % 499).cast("string")))
        .as("provider"))
      // the fact-side payload rides the shuffle (the agg sums it), keeping
      // the hub partition's COMPRESSED bytes proportional to its rows —
      // the signal AQE's skew detector actually reads
      .withColumn("pay", pmod(xxhash64(col("doc_id"), col("f")), lit(1000000L)))
    val left1 = withProvider(docs0.select(col("doc_id"))).localCheckpoint()
    val leftN = withProvider((0 until blowup).map { k =>
      docs0.select((col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"))
    }.reduce(_.union(_))).localCheckpoint()
    val nLeftN = leftN.count()
    // 800 attribute rows per provider: big enough that the join output is
    // 800× the fact stream, small enough to checkpoint once. Derived from
    // the N× provider space — the id shift changes the %499 tail key, so
    // a 1×-derived dim would silently drop blown copies from the inner
    // join (caught by the fan-out gate below); the 1× providers are the
    // k=0 subset, so one dim serves both scales
    val dim = leftN.select(col("provider")).distinct()
      .select(col("provider"),
        explode(sequence(lit(0L), lit(attrs - 1))).as("attr"))
      // bounded payload: a raw xxhash64 sum overflows ANSI long addition
      // over the 800×N-row join output
      .withColumn("payload",
        pmod(xxhash64(col("provider"), col("attr")), lit(1000000L)))
      .localCheckpoint()
    // (count, dim-payload sum, fact-payload sum) plus the DataFrame whose
    // executed plan carries the AQE skew metrics for gate (c)
    def agg(joined: org.apache.spark.sql.DataFrame)
        : ((Long, Long, Long), org.apache.spark.sql.DataFrame) = {
      val df = joined.agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
        sum(col("pay")).as("sp"))
      val r = df.collect()(0)
      ((r.getLong(0), r.getLong(1), r.getLong(2)), df)
    }
    // wall + external-core usage over the exact window (HostLoad): the
    // evidence gate (b) needs before it may hard-fail on a shared host
    def timedExt[A](f: => A): (Double, Double, A) = {
      val j0 = HostLoad.cpuJiffies()
      val t0 = System.nanoTime()
      val a = f
      val w = (System.nanoTime() - t0) / 1e9
      (w, HostLoad.externalCores(j0, HostLoad.cpuJiffies(), w), a)
    }
    // every AQEShuffleReadExec in the final adaptive plan, including under
    // nested stages; numSkewedPartitions sums to 0 when OptimizeSkewedJoin
    // never fired
    def skewedPartitions(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => nodes(q.plan)
        case other => other.children.flatMap(nodes)
      })
      nodes(df.queryExecution.executedPlan)
        .flatMap(_.metrics.get("numSkewedPartitions").map(_.value)).sum
    }
    val confKeys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128k")
    val prev = confKeys.map { case (k, _) => k -> spark.conf.getOption(k) }
    confKeys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // untimed warmup: JIT/codegen spin-up otherwise lands on the 1×
      // plain wall and distorts every ratio derived from it
      agg(left1.join(dim, Seq("provider")))
      val (wPlain1, _, _) = timedExt(agg(left1.join(dim, Seq("provider"))))
      val (wPlainN, extPlainN, (rPlain, dfPlainN)) =
        timedExt(agg(leftN.join(dim, Seq("provider"))))
      def saltPair(): (Double, Double, Double, Double, (Long, Long, Long)) = {
        val (w1, e1, _) = timedExt(agg(graft.operators.SkewJoin
          .saltedInnerJoin(left1, dim, "provider", 8,
            Seq(col("doc_id"), col("f")))))
        val (wN, eN, (r, _)) = timedExt(agg(graft.operators.SkewJoin
          .saltedInnerJoin(leftN, dim, "provider", 8,
            Seq(col("doc_id"), col("f")))))
        (w1, e1, wN, eN, r)
      }
      var (wSalt1, extSalt1, wSaltN, extSaltN, rSalt) = saltPair()
      def slack(w1: Double): Double = math.max(0.3, 0.25 * w1)
      def sublinear(wN: Double, w1: Double): Boolean =
        wN <= 0.7 * blowup * w1 + slack(w1)
      var saltAttempts = 1
      if (!sublinear(wSaltN, wSalt1)) {
        // retry once before hard-failing (ADVICE r12): the first pair may
        // have been measured under a co-tenant burst
        val first = (wSalt1, extSalt1, wSaltN, extSaltN)
        val again = saltPair()
        saltAttempts = 2
        require(again._5 == rSalt,
          s"salted join result drifted across reruns: ${again._5} vs $rSalt")
        wSalt1 = again._1; extSalt1 = again._2
        wSaltN = again._3; extSaltN = again._4
        require(sublinear(wSaltN, wSalt1),
          f"salted join wall superlinear at $blowup× in BOTH attempts: " +
            f"attempt1 ${first._3}%.1f s (ext ${first._4}%.1f cores) vs " +
            f"${first._1}%.1f s at 1× (ext ${first._2}%.1f); attempt2 " +
            f"$wSaltN%.1f s (ext $extSaltN%.1f) vs $wSalt1%.1f s at 1× " +
            f"(ext $extSalt1%.1f)")
      }
      require(rPlain == rSalt,
        s"salted join diverged from the plain join at $blowup×: " +
          s"$rSalt vs $rPlain")
      require(rPlain._1 == attrs * nLeftN,
        s"join fan-out wrong: ${rPlain._1} rows, expected ${attrs * nLeftN}")
      val nSkewed = skewedPartitions(dfPlainN)
      require(nSkewed >= 1L,
        s"AQE never split the skewed partition on the plain $blowup× join " +
          "(numSkewedPartitions = 0) — the leg measured nothing; check the " +
          "scaled skew thresholds against the fixture's partition sizes")
      val top = graft.operators.Profiling.joinSkewReport(
        leftN, "provider", dim, "provider", topK = 1).head()
      require(top.getAs[String]("key") == "hub0",
        s"skew report top key is ${top.getAs[String]("key")}, not hub0")
      val share = top.getAs[Long]("share_micro")
      require(share >= 300000L,
        s"hub0 share_micro $share < 300000 — fixture lost its skew")
      def r1(x: Double): Double = math.round(x * 10.0) / 10.0
      def r2(x: Double): Double = math.round(x * 100.0) / 100.0
      s""","skew_plain_sec_1x":${r1(wPlain1)},"skew_plain_sec":${r1(wPlainN)},""" +
        s""""skew_salted_sec_1x":${r1(wSalt1)},"skew_salted_sec":${r1(wSaltN)},""" +
        s""""skew_gate_slack_sec":${r2(slack(wSalt1))},""" +
        s""""skew_salt_attempts":$saltAttempts,""" +
        s""""skew_ext_cores_plain":${r1(extPlainN)},""" +
        s""""skew_ext_cores_salted":${r1(extSaltN)},""" +
        s""""skew_aqe_split_partitions":$nSkewed,""" +
        s""""skew_rows":${rPlain._1},"skew_top_key":"hub0",""" +
        s""""skew_share_micro":$share"""
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def dqLeg(spark: SparkSession,
      docs0: org.apache.spark.sql.DataFrame,
      blown: org.apache.spark.sql.DataFrame, blowup: Int): String = {
    import graft.operators.Constraints
    import graft.operators.Constraints._
    val checks = Seq(
      Completeness("text", 1000000L),
      InSet("lang", Seq("en", "de", "fr", "es", "zh"), 1000000L),
      MatchesRegex("source", "^src[0-9]+$", 1000000L))
    def metrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Constraints.audit(df, checks).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t0 = System.nanoTime()
    val m1 = metrics(docs0)
    val wall1 = (System.nanoTime() - t0) / 1e9
    val tN = System.nanoTime()
    val mN = metrics(blown)
    val wallN = (System.nanoTime() - tN) / 1e9
    require(m1 == mN,
      s"audit rates not scale-free at $blowup×: $m1 vs $mN")
    require(wallN <= 0.7 * blowup * wall1 + 2.0,
      f"dq wall superlinear at $blowup×: $wallN%.1f s vs $wall1%.1f s")
    def r1d(x: Double): Double = math.round(x * 10.0) / 10.0
    s""","dq_rates_invariant":true,"dq_wall_1x":${r1d(wall1)}""" +
      s""","dq_wall_${blowup}x":${r1d(wallN)}"""
  }

  /** Behavioral-events rehearsal at the blowup (round-10: sessionize +
    * funnel are new surface with no blowup evidence). Events are blown
    * up with SHIFTED user ids, so each copy is a disjoint user
    * population — session and funnel counts must scale EXACTLY N×
    * (asserted equal, not just sublinear): a window that leaked across
    * copies, a gap rule reading the wrong granularity, or a funnel
    * threshold crossing user boundaries all break the equality.
    */
  private def eventsLeg(spark: SparkSession, sfDir: String,
      blowup: Int): String = {
    val e0 = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    def blow(n: Int) = (0 until n).map { k =>
      e0.select(
        (col("event_id") + lit(k.toLong * 100000000L)).as("event_id"),
        (col("user_id") + lit(k.toLong * 10000000L)).as("user_id"),
        col("ts"), col("event_type"))
    }.reduce(_.union(_))
    val base = blow(1).localCheckpoint()
    val blown = blow(blowup).localCheckpoint()
    def runOnce(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val nSess = graft.operators.Events
        .sessions(df, "user_id", "ts", "event_id").count()
      val reached = graft.operators.Events
        .funnel(df, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .agg(coalesce(sum(col("n_reached")), lit(0L))).head().getLong(0)
      (nSess, reached)
    }
    val t1 = System.nanoTime()
    val (s1, f1) = runOnce(base)
    val wall1 = (System.nanoTime() - t1) / 1e9
    val tN = System.nanoTime()
    val (sN, fN) = runOnce(blown)
    val wallN = (System.nanoTime() - tN) / 1e9
    require(sN == blowup * s1,
      s"session count not exactly $blowup×: $sN vs $s1 at 1× — a window " +
        "leaked across the disjoint user copies")
    require(fN == blowup * f1,
      s"funnel reach not exactly $blowup×: $fN vs $f1 at 1×")
    require(wallN <= 0.7 * blowup * wall1 + 2.0,
      f"events wall superlinear at $blowup×: $wallN%.1f s vs $wall1%.1f s")
    def r1d(x: Double): Double = math.round(x * 10.0) / 10.0
    s""","events_sessions_1x":$s1,"events_sessions_${blowup}x":$sN""" +
      s""","events_wall_1x":${r1d(wall1)},"events_wall_${blowup}x":${r1d(wallN)}"""
  }

  /** Incremental-index rehearsal at the blowup (round-8 verdict #1: the
    * one 100 TB claim that rested on sf0.1 evidence). The blown corpus is
    * replayed as FOUR monthly snapshots — a 4-copy bootstrap, one
    * all-add increment, an increment that also edits ~1% of the oldest
    * copy (status `changed` → version suppression, month 3), and a final
    * increment that removes ~1% of another copy (status `removed`,
    * month 4) — through `DeltaCurate.run`, twice: sequence A uncompacted,
    * sequence B with `DeltaCurate.compact` after increment 2, so B's
    * later increments run against a compacted index.
    *
    * Asserted (the run THROWS on violation, so a green line is the proof):
    *  (a) survivor id-sets and diff counts of every increment are
    *      BIT-IDENTICAL between A and B — compaction against the curated
    *      corpus forgets nothing a future increment needs;
    *  (b) each append adds AT MOST ONE file per bucket per table (the r8
    *      one-file-per-bucket invariant — the accumulating small-files
    *      tax stays killed under a multi-increment sequence), and after
    *      compaction each bucket holds at most one file;
    *  (c) per-increment wall stays sublinear in index size: increment 4
    *      (same delta size as increment 2, index ~2× larger) is gated at
    *      ≤2.5× increment 2's wall — a linear-in-index regression (the
    *      full-index scans the one-sided joins and O(matched) caps
    *      replaced) would blow through it at this ratio.
    */
  private def deltaLeg(spark: SparkSession,
      docs0: org.apache.spark.sql.DataFrame, blowup: Int,
      cfg: graft.operators.Curation.Config): String = {
    if (blowup < 5) return "" // the 4-snapshot split needs ≥5 copies
    val cuts = Seq(2 * blowup / 5, 3 * blowup / 5, 4 * blowup / 5, blowup)
    def copies(hi: Int) = (0 until hi).map { k =>
      docs0.select(
        (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" copysalt$k")).as("text"),
        col("lang"), col("source"))
    }.reduce(_.union(_))
    // month 3 edits ~1% of copy-0 (cosmetic near-dup rewrites: suppressed,
    // prior version stays canonical); month 4 removes ~1% of copy-1
    def edited(df: org.apache.spark.sql.DataFrame) = df.withColumn("text",
      when(col("doc_id") < 10000000L && col("doc_id") % 97 === 0,
        concat(col("text"), lit(" editv2"))).otherwise(col("text")))
    val snaps = Seq(
      copies(cuts(0)),
      copies(cuts(1)),
      edited(copies(cuts(2))),
      edited(copies(cuts(3))).filter(!(col("doc_id") >= 10000000L &&
        col("doc_id") < 20000000L && col("doc_id") % 89 === 0)))

    // files per bucket of a managed bucketed table, via its catalog
    // location (bucket id is encoded in the file name: ..._00007.c000...).
    // The location string may or may not carry a file: scheme depending
    // on how Spark normalized it — strip textually rather than URI-parse
    // (a scheme-less value or a space would make `new URI` throw; the
    // SparkSpec.dropTable lesson).
    def bucketFiles(table: String): Map[Int, Int] = {
      val loc = spark.sql(s"DESC FORMATTED $table")
        .filter(col("col_name") === "Location").head.getString(1)
        .stripPrefix("file://").stripPrefix("file:")
      val rx = "_(\\d{5})\\.".r
      Option(new java.io.File(loc).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .flatMap(f => rx.findFirstMatchIn(f.getName).map(_.group(1).toInt))
        .groupBy(identity).view.mapValues(_.length).toMap
    }
    val buckets = 16

    final case class SeqResult(walls: Seq[Double], survivors: Seq[Set[Long]],
      counts: Seq[(Long, Long, Long, Long)], compactRows: Option[(Long, Long)])
    def runSeq(tag: String, compactAfter: Int): SeqResult = {
      val fp = s"dl_${tag}_fp"; val sig = s"dl_${tag}_sig"
      // DROP only reaches tables this JVM's catalog knows; a previous
      // run's warehouse dirs survive and would fail the managed-table
      // create with LOCATION_ALREADY_EXISTS — remove them too
      val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file://").stripPrefix("file:"))
      Seq(fp, sig).foreach { t =>
        Seq(t, s"${t}__compact", s"${t}__old").foreach { n =>
          spark.sql(s"DROP TABLE IF EXISTS $n")
          val dir = new java.io.File(wh, n)
          if (dir.exists()) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(dir.toPath).sorted(
                java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .iterator().asScala.foreach(p => java.nio.file.Files.delete(p))
          }
        }
      }
      var prevFiles = Map.empty[String, Map[Int, Int]]
      def auditAppend(): Unit = Seq(fp, sig).foreach { t =>
        val now = bucketFiles(t)
        // non-vacuousness guard: every append writes at least one file,
        // so an empty map means the location resolution or the filename
        // regex broke — the ≤1-per-bucket requires below would then
        // iterate zero times and "pass" having audited nothing
        require(now.values.sum > prevFiles.getOrElse(t, Map.empty).values.sum,
          s"$t file audit saw no new files after an append — " +
            "bucketFiles is resolving the wrong directory")
        val before = prevFiles.getOrElse(t, Map.empty)
        now.foreach { case (b, n) =>
          require(n - before.getOrElse(b, 0) <= 1,
            s"$t bucket $b grew by ${n - before.getOrElse(b, 0)} files in one append")
        }
        prevFiles += t -> now
      }
      var prev = snaps.head.limit(0)
      var acc: Option[org.apache.spark.sql.DataFrame] = None
      val walls = Seq.newBuilder[Double]
      val ids = Seq.newBuilder[Set[Long]]
      val counts = Seq.newBuilder[(Long, Long, Long, Long)]
      var compactRows: Option[(Long, Long)] = None
      snaps.zipWithIndex.foreach { case (snap, i) =>
        val t0 = System.nanoTime()
        val r = graft.processes.DeltaCurate.run(prev, snap,
          "doc_id", "text", "lang", cfg, fp, sig, buckets = buckets)
        val inc = r.survivors.localCheckpoint()
        ids += inc.select("doc_id").collect().map(_.getLong(0)).toSet
        walls += (System.nanoTime() - t0) / 1e9
        counts += ((r.added, r.changed, r.removed, r.gated))
        auditAppend()
        // curated corpus so far: latest surviving version per id
        acc = Some(acc match {
          case None => inc
          case Some(a) => inc.unionByName(
            a.join(inc.select("doc_id"), Seq("doc_id"), "left_anti"))
        })
        if (i == compactAfter) {
          compactRows = Some(graft.processes.DeltaCurate.compact(
            acc.get, "doc_id", "text", fp, sig, buckets = buckets))
          // CRASH-WINDOW RECOVERY exercised at scale (verdict r16 #6):
          // simulate a JVM death between rewriteBucketed's two renames —
          // the live fp name missing, the old copy under __old, a
          // fully-written __compact sibling — then compact AGAIN. The
          // rewrite's recover-at-start must roll BACK to the aside copy
          // (never forward: tmp may be half-written in the real window)
          // and redo the rewrite; the row counts must match the clean
          // compaction exactly (same live corpus), and the post-recovery
          // file audit must still hold one file per bucket.
          spark.sql(s"CREATE TABLE ${fp}__compact AS " +
            s"SELECT * FROM $fp LIMIT 1")
          spark.sql(s"ALTER TABLE $fp RENAME TO ${fp}__old")
          val recompact = graft.processes.DeltaCurate.compact(
            acc.get, "doc_id", "text", fp, sig, buckets = buckets)
          require(recompact == compactRows.get,
            s"crash-window recompaction diverged: $recompact vs " +
              s"${compactRows.get} — recover-at-start rolled to the " +
              "wrong copy")
          Seq(fp, sig).foreach { t =>
            val now = bucketFiles(t)
            require(now.nonEmpty,
              s"$t file audit saw nothing after compaction — " +
                "bucketFiles is resolving the wrong directory")
            now.foreach { case (b, n) =>
              require(n <= 1, s"$t bucket $b has $n files after compaction")
            }
            prevFiles += t -> now
          }
        }
        prev = snap
      }
      SeqResult(walls.result(), ids.result(), counts.result(), compactRows)
    }

    val a = runSeq("a", compactAfter = -1)
    val b = runSeq("b", compactAfter = 1)
    require(a.survivors == b.survivors,
      "survivor sets diverged between the uncompacted and compacted sequences: " +
        a.survivors.map(_.size) + " vs " + b.survivors.map(_.size))
    require(a.counts == b.counts,
      s"diff counts diverged: ${a.counts} vs ${b.counts}")
    val w2 = a.walls(1); val w4 = a.walls(3)
    require(w4 <= 2.5 * math.max(w2, 0.5),
      s"increment-4 wall $w4 s vs increment-2 $w2 s: index growth is leaking " +
        "into per-increment cost")
    def arr(xs: Seq[Double]) =
      xs.map(x => math.round(x * 100.0) / 100.0).mkString("[", ",", "]")
    s""","delta_inc_sec":${arr(a.walls)}""" +
      s""","delta_inc_sec_compacted":${arr(b.walls)}""" +
      s""","delta_survivors":${a.survivors.map(_.size).mkString("[", ",", "]")}""" +
      s""","delta_counts":"${a.counts.mkString(";")}"""" +
      s""","delta_parity":true,"delta_files_ok":true""" +
      b.compactRows.map { case (f, s) =>
        s""","delta_compact_fp_rows":$f,"delta_compact_sig_rows":$s"""
      }.getOrElse("")
  }
}
