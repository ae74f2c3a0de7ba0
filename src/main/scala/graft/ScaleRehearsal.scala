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
  * Usage: runMain graft.ScaleRehearsal [sfDir] [blowup] [outDir]
  * Prints one JSON line, mirroring the Bench contract.
  */
object ScaleRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val blowup = if (args.length > 1) args(1).toInt else 10
    val outDir = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("graft-scale").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    val eval = docs0.limit(50).select(col("doc_id"), col("text"))

    val t0 = System.nanoTime()
    val (train, test) = graft.operators.Curation.curate(
      blown, "doc_id", "text", "lang", cfg, Some(eval))
    val nTrain = train.count(); val nTest = test.count()
    val tCurate = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val res = graft.processes.TrainingPipeline.run(
      blown, "doc_id", "text", "lang", cfg,
      numMerges = 100, budget = 2048, nShards = 8,
      outPath = s"$outDir/shards")
    val tPipeline = (System.nanoTime() - t1) / 1e9

    // round-5 heavy operators at the same blowup: the span seed join
    // (df-capped pairing over 10× the seed stream — the salt token
    // breaks up runs, so spans come from genuine overlap, and shared
    // grams sit at 10× their base df, stressing the cap) and the CMS
    // heavy-hitter pass over ~10× the token stream
    val t2 = System.nanoTime()
    val nSpanPairs = graft.operators.SpanDedup.sharedSpans(
      blown, "text", "doc_id", l = 5, minSpan = 8, maxDf = 50).count()
    val tSpans = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val nHeavy = graft.operators.HeavyHitters.heavyTokens(
      blown, "text", minCount = 40L * blowup).count()
    val tHeavy = (System.nanoTime() - t3) / 1e9
    sampling = false

    // plain Double interpolation (the Bench contract): an f"%.1f" render
    // is default-locale-dependent and a comma-decimal locale would emit
    // invalid JSON
    def r1(x: Double): Double = math.round(x * 10.0) / 10.0
    println(
      s"""{"metric":"scale_rehearsal","sf":"$sfDir","blowup":$blowup,""" +
      s""""rows_in":$nIn,"curate_sec":${r1(tCurate)},""" +
      s""""train_docs":$nTrain,"test_docs":$nTest,""" +
      s""""pipeline_sec":${r1(tPipeline)},""" +
      s""""pipeline_train_docs":${res.trainDocs},""" +
      s""""train_bins":${res.trainBins},""" +
      s""""spans_sec":${r1(tSpans)},"span_pairs":$nSpanPairs,""" +
      s""""heavy_sec":${r1(tHeavy)},"heavy_tokens":$nHeavy,""" +
      s""""peak_cache_bytes":$peakCache,""" +
      s""""cc_converged":true}""")
    spark.stop()
  }
}
