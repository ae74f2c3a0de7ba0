package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines ([EXT]).
  *
  * Everything here is hash-based, not RNG-based: `sample()`'s Bernoulli
  * draw depends on partitioning and seed plumbing, so the same logical
  * dataset can yield different samples across runs/layouts — unacceptable
  * when the sample defines a train/test split that must be reproducible at
  * 100 TB and auditable row-by-row. xxhash64(id) is stable across runs,
  * partitionings, and cluster sizes, and evaluates in codegen (narrow scan,
  * no shuffle, pushdown-friendly).
  *
  * Key-column contract: keys should be NON-NULL. Null keys all hash to the
  * same bucket (xxhash64 leaves its seed untouched on null input), so the
  * entire null population moves in or out of a sample — and lands
  * wholesale on one side of a split — as a single block. Filter or
  * synthesize keys for null rows before sampling.
  */
object Sampling {

  private val Buckets = 1000000000L

  /** Uniform hash bucket in [0, 1) for a key column, quantized to
    * `1/Buckets` (1e-9) steps — the granularity floor for every rate here.
    */
  private def unitHash(key: Column): Column =
    pmod(xxhash64(key), lit(Buckets)).cast("double") / Buckets.toDouble

  /** THE portable md5 draw, shared by every cross-engine-oracled sampling
    * decision (mixture epochs, next-fit buckets, shard split, per-key
    * quota order). One definition so the wire contract — md5 of the
    * domain-prefixed stringified key, first 8 hex chars as a long — can
    * never drift between operators and their DuckDB oracles
    * (`('0x' || substr(md5(prefix || key), 1, 8))::BIGINT`).
    */
  def md5Draw(key: Column, prefix: String): Column =
    md5(if (prefix.isEmpty) key.cast("string")
    else concat(lit(prefix), key.cast("string")))

  /** First 8 hex chars of [[md5Draw]] as a long in [0, 2^32). */
  def md5Hex8(key: Column, prefix: String): Column =
    conv(substring(md5Draw(key, prefix), 1, 8), 16, 10).cast("long")

  /** [[md5Hex8]] reduced mod n — the portable bucket/shard assignment. */
  def md5Mod(key: Column, prefix: String, n: Long): Column =
    pmod(md5Hex8(key, prefix), lit(n))

  /** [[md5Hex8]] reduced to a uniform double in [0, 1) — the portable
    * unit draw (long→double is exact below 2^32, so this equals parsing
    * the 8 hex chars as a fraction). ONE definition on purpose: the
    * 2^32 divisor is the other half of the wire contract the md5Draw
    * scaladoc pins, and a copy drifting from its DuckDB oracle would be
    * invisible until a hash mismatch.
    */
  def md5Unit(key: Column, prefix: String): Column =
    md5Hex8(key, prefix).cast("double") / 4294967296.0

  private def checkFraction(f: Double): Unit =
    require(f == 0.0 || (f >= 1.0 / Buckets && f <= 1),
      s"fraction=$f out of range: must be 0, or in [${1.0 / Buckets}, 1] " +
        "(rates below the hash granularity would silently oversample)")

  /** Keep ~`fraction` of rows, chosen by key hash (deterministic, exact
    * same rows on every run and any partitioning).
    */
  def uniform(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    checkFraction(fraction)
    df.filter(unitHash(col(keyCol)) < fraction)
  }

  /** Per-stratum sampling rates (e.g. downsample dominant languages,
    * keep all of rare ones). Strata absent from `fractions` default to 0.
    */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double]): DataFrame = {
    fractions.values.foreach(checkFraction)
    val rate = fractions.foldLeft(lit(0.0)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, f).otherwise(acc)
    }
    df.filter(unitHash(col(keyCol)) < rate)
  }

  /** Deterministic mixture construction with fractional EPOCH weights —
    * the data-mixing step stratified() cannot express: a weight above 1
    * up-samples by repetition (weight 2.5 ⇒ every doc appears twice and
    * half the docs, hash-chosen, a third time), a weight below 1
    * down-samples, 0 or absent drops the stratum. Copy counts are
    * md5-hash-based so the mixture is reproducible row-by-row across
    * runs, partitionings, and engines (md5 is bit-identical everywhere —
    * this path is DuckDB-oracled). Output repeats input rows with a
    * 1-based `copy` index; downstream shuffling/packing treats copies as
    * independent documents. Narrow: one generator per row, no shuffle.
    */
  def mixture(df: DataFrame, strataCol: String, keyCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 100),
      s"weights must be in [0, 100], got $weights")
    val w = weights.foldLeft(lit(0.0)) { case (acc, (stratum, ww)) =>
      when(col(strataCol) === stratum, ww).otherwise(acc)
    }
    val u01 = md5Unit(col(keyCol), "mix ")
    val copies = (floor(w) + when(u01 < w - floor(w), 1).otherwise(0))
      .cast("int")
    df.withColumn("__copies", copies)
      .filter(col("__copies") >= 1)
      .withColumn("copy", explode(sequence(lit(1), col("__copies"))))
      .drop("__copies")
  }

  /** Temperature-scaled stratum mixture (the multilingual/multi-source
    * rebalancing rule: stratum s is sampled proportionally to
    * `count(s)^alpha`, so alpha = 1 keeps natural proportions and
    * alpha → 0 flattens toward uniform). Expected output size is
    * `targetTotal` rows; per-stratum weights become fractional EPOCH
    * counts applied by [[mixture]]'s md5 draw, so the result is exact,
    * reproducible, and cross-engine oracle-able.
    *
    * Fit is one bounded stratum-count collect. Determinism across
    * engines: alpha = 0.5 uses `sqrt` (IEEE-correctly-rounded everywhere,
    * unlike `pow`), and both the normalizer and the final weights are
    * rounded to 6 decimals before the draw, so an oracle replaying the
    * formula computes bit-identical weights.
    */
  def temperatureMixture(df: DataFrame, strataCol: String, keyCol: String,
      alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0, 1]: $alpha")
    require(targetTotal > 0, s"targetTotal must be positive: $targetTotal")
    // bounded collect: limit(cap+1) rides the existing aggregate, so an
    // unbounded stratum column ships at most 100001 rows to the driver
    // before the require fires — one job, no extra distinct scan
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n"))
      .limit(100001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.length <= 100000,
      s"more than 100000 strata — bound the stratum column first")
    if (counts.isEmpty) return df.withColumn("copy", lit(1)).limit(0)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val powF: Double => Double =
      if (alpha == 0.5) math.sqrt else math.pow(_, alpha)
    // fixed ascending-stratum summation order (the oracle's sum order is
    // the engine's choice; rounding to 6 decimals absorbs the ulps).
    // Weights saturate at mixture()'s 100-epoch ceiling: a tiny stratum
    // under a large targetTotal would otherwise compute an unbounded
    // epoch count and trip mixture's require mid-job — capping is the
    // documented semantic (extreme rare-stratum upsampling stops at 100
    // copies), not a crash.
    val z = round6(counts.map { case (_, n) => powF(n.toDouble) }.sum)
    val weights = counts.map { case (s, n) =>
      s -> math.min(100.0, round6(powF(n.toDouble) / z * targetTotal / n))
    }.toMap
    mixture(df, strataCol, keyCol, weights)
  }

  /** Token-budget mixture: per stratum, take documents in md5(key) draw
    * order until the stratum's TOKEN budget is exhausted — the mixture a
    * training run actually specifies ("200M tokens of code, 50M of
    * forums"), where doc-count mixtures over- or under-shoot by the
    * per-source length skew. A doc is kept while the running token total
    * BEFORE it is still under budget, so the budget is exceeded by at
    * most one document (the standard take-until-crossing contract; an
    * exact cut would split a document).
    *
    * Plan shape: one exchange by stratum + one per-stratum sort by the
    * md5 draw (a running-sum window) — no global sort, no collect; at
    * 100 TB each stratum streams independently and skew is bounded by
    * the largest SOURCE, which is the natural unit here. Strata absent
    * from `budgets` are dropped (budget 0). Deterministic and
    * cross-engine replayable: the draw is the md5 hex order and the
    * running sum is exact integer arithmetic.
    *
    * Returns the kept rows plus (`__draw` dropped) the running
    * `tokens_before` audit column — callers verifying the budget read it
    * directly.
    */
  def tokenBudgetMixture(df: DataFrame, strataCol: String, keyCol: String,
      tokenCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0), s"negative budget in $budgets")
    val budget = budgets.foldLeft(lit(-1L)) { case (acc, (stratum, b)) =>
      when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(concat(lit("tokmix "), col(keyCol).cast("string"))))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    df.filter(budget >= 0L)
      .withColumn("tokens_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .filter(col("tokens_before") < budget)
  }

  /** Disjoint, exhaustive train/test split by key hash. Rows with the same
    * key always land on the same side — the property that prevents
    * train/test leakage when keys repeat (same document re-crawled, same
    * user across events).
    */
  def trainTestSplit(df: DataFrame, keyCol: String,
      testFraction: Double): (DataFrame, DataFrame) = {
    val t = testFlag(col(keyCol), testFraction)
    (df.filter(!t), df.filter(t))
  }

  /** [[trainTestSplit]]'s decision as a boolean COLUMN (true = test) — for
    * single-frame consumers (Curation.curateFlagged) that want the split
    * flag without duplicating the upstream plan into two filtered halves.
    * Single source of truth: trainTestSplit filters exactly this flag.
    */
  def testFlag(key: Column, testFraction: Double): Column = {
    require(testFraction >= 1.0 / Buckets && testFraction < 1,
      s"testFraction=$testFraction out of [${1.0 / Buckets}, 1)")
    unitHash(key) < testFraction
  }

  /** Group-disjoint train/test split: the draw hashes `groupCol` (a
    * source, domain, or author), so every row of a group lands on the
    * SAME side — the leakage-safe split when near-duplicates cluster
    * within groups (per-doc splitting would put a doc in train and its
    * sibling in test, inflating eval). The md5 draw makes the assignment
    * deterministic, portable (oracle replays it), and stable under any
    * row-level churn within a group; rows with a NULL group go to train
    * (no group identity → nothing to leak against).
    * Plan: one narrow filter per side, zero shuffles.
    */
  def groupDisjointSplit(df: DataFrame, groupCol: String,
      testFraction: Double): (DataFrame, DataFrame) = {
    require(testFraction >= 1.0 / Buckets && testFraction < 1,
      s"testFraction=$testFraction out of [${1.0 / Buckets}, 1)")
    // md5Hex8/2^32, the cross-engine wire contract (md5Draw family)
    val draw = md5Unit(col(groupCol), "split ")
    (df.filter(col(groupCol).isNull || draw >= testFraction),
      df.filter(col(groupCol).isNotNull && draw < testFraction))
  }

  /** Near-dup-leakage-safe split ([EXT]): every member of a near-dup
    * CLUSTER lands on the same side — [[trainTestSplit]] hashes the doc
    * id, so a document and its near-duplicate can straddle train/test
    * and inflate eval ([[groupDisjointSplit]] fixes that only when
    * near-dups stay within a known group column). `clusters` is the
    * `(idCol, component)` frame from [[Dedup.nearDupClusters]] /
    * [[ConnectedComponents.run]]; docs outside any cluster split by
    * their own id (a singleton component). The draw hashes the
    * component representative with the same portable md5 contract as
    * [[groupDisjointSplit]], so the assignment is deterministic,
    * engine-replayable, and stable under within-cluster churn.
    * Plan: one equi-join against the (small) cluster frame + one narrow
    * filter per side.
    */
  def clusterDisjointSplit(docs: DataFrame, idCol: String,
      clusters: DataFrame, testFraction: Double): (DataFrame, DataFrame) = {
    // ConnectedComponents.run / Dedup.nearDupClusters emit the member
    // column as literally "id" whatever the caller's idCol is (round-9
    // review finding: resolving idCol against that frame threw for any
    // idCol other than "id") — accept either spelling
    val cid = if (clusters.columns.contains(idCol)) idCol else "id"
    val comp = clusters.select(col(cid).as(idCol),
      col("component").as("__comp"))
    val withG = docs.join(comp, Seq(idCol), "left")
      .withColumn("__grp",
        coalesce(col("__comp"), col(idCol)).cast("string"))
    val (train, test) = groupDisjointSplit(withG, "__grp", testFraction)
    (train.drop("__comp", "__grp"), test.drop("__comp", "__grp"))
  }

  /** Per-key quota: keep at most `maxPerKey` rows per key (the crawl-
    * curation cap that stops one host/domain from dominating the mix).
    * Selection is by md5(id) order — a deterministic pseudo-random draw,
    * portable across engines (the oracle replays it) and PREFIX-CONSISTENT:
    * the rows kept at quota k are a superset of those kept at k' < k, so
    * tightening a quota never rotates the sample.
    *
    * Scale: the rank filter compiles to WindowGroupLimit (plan-gated), so
    * each map task pre-prunes to `maxPerKey` rows per key BEFORE the
    * window exchange — a skewed host ships O(tasks × quota) rows, not its
    * full population.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
      maxPerKey: Int): DataFrame = {
    require(maxPerKey > 0, s"maxPerKey must be positive, got $maxPerKey")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(md5Draw(col(idCol), ""), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerKey)
      .drop("__rn")
  }

  /** Approximate equi-depth binning by SAMPLED thresholds — the 100 TB
    * path the exact ntile variant (q_equidepth_bins) points at. Exact
    * order statistics of a bounded md5-ordered sample (the q_ppl_buckets
    * pattern: integer ceil ranks, no float·n ulp hazard, hex-string
    * draw order) become `bins-1` literal cut points; every row then bins
    * by literal comparison — a TakeOrderedAndProject for the sample plus
    * one narrow scan, ZERO global sorts at any corpus size. Returns one
    * row per non-empty bin: (bin, n, lo, hi), values as doubles.
    *
    * Bin rule: bin(v) = 1 + #{cuts < v} — identical to the first-match
    * `v <= cut_i` chain over non-decreasing cuts, and what the DuckDB
    * oracle replays. Sampled thresholds approximate the DEPTH (bin
    * populations wobble ~O(n/√sample)); the boundaries themselves are
    * exact order statistics of the deterministic sample, so the output
    * is bit-stable across runs, partitionings, and engines.
    */
  def equiDepthApprox(df: DataFrame, valueCol: String, idCol: String,
      bins: Int = 10, sampleSize: Int = 200): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of [2,1000]: $bins")
    require(sampleSize >= bins,
      s"sampleSize ($sampleSize) must be >= bins ($bins)")
    val sample = df
      .orderBy(md5(col(idCol).cast("string")))
      .limit(sampleSize)
      .select(col(valueCol).cast("double").as("v"))
      .collect().map(_.getDouble(0)).sorted
    if (sample.isEmpty) {
      return df.select(lit(0L).as("bin"), lit(0L).as("n"),
        lit(0.0).as("lo"), lit(0.0).as("hi")).limit(0)
    }
    val n = sample.length
    // ceil-rank order statistic per bin boundary, directly in bin units:
    // ceil(n·d/bins) — identical to the q_ppl_buckets percent form for
    // bins=10 (both are ceil(n·d/10)), and exact for bins > 100 where an
    // integer-percent intermediate would round to 0
    def cutAt(d: Int): Double = sample((n * d + bins - 1) / bins - 1)
    val cuts = (1 until bins).map(cutAt)
    val v = col(valueCol).cast("double")
    val bin = cuts.foldLeft(lit(1L))((acc, t) =>
      acc + when(lit(t) < v, 1L).otherwise(0L))
    df.withColumn("bin", bin)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi"))
  }

  /** Curriculum shard ordering ([EXT]): shard assignment stays the
    * md5-uniform draw (every shard gets an unbiased sample of the
    * corpus), but WITHIN each shard rows are positioned easy-first by
    * `difficultyCol` (md5 draw, then id as deterministic tie-breaks) —
    * the curriculum-learning layout where each worker's shard file
    * starts with its easiest examples. One exchange on the shard key,
    * then per-shard local sorts in parallel — no global sort at any
    * scale, exactly the [[graft.sinks.ShardWriter]] layout with a
    * difficulty-first sort key.
    */
  def curriculumOrder(df: DataFrame, idCol: String, difficultyCol: String,
                      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(difficultyCol), col("__d"), col(idCol))
    df.select(col(idCol), col(difficultyCol),
        md5Mod(col(idCol), "shard ", nShards.toLong).as("shard"),
        md5Draw(col(idCol), "shard ").as("__d"))
      .withColumn("position", row_number().over(w).cast("long"))
      .drop("__d")
  }

  /** Sqrt-flattened SUBSAMPLING quota mixture ([EXT]): the downsampling
    * complement of [[temperatureMixture]] (which UPSAMPLES via epoch
    * copies) — select exactly quota docs per stratum, quotas
    * proportional to sqrt(count) (T = 0.5 pinned because `sqrt` is
    * cross-engine bit-stable where `pow` is not). Quota per stratum is
    * `min(count, floor(totalDocs · sqrt(count) / Σ sqrt(count)))` with
    * the Σ rounded to 6 decimals (the order-dependent-double-sum rule);
    * kept rows are the first `quota` per stratum in md5 draw order —
    * deterministic and DuckDB-replayable end to end. NULL strata are
    * excluded (a mixture spec has no null source).
    *
    * Scale shape: one count aggregate (map-side combined), the quota
    * table is broadcast (O(strata) rows), and selection is one exchange
    * on the stratum + per-stratum local sort — the per-SOURCE stream,
    * like [[tokenBudgetMixture]]. Returns
    * (keyCol, strataCol, rk, quota) for the kept rows.
    */
  def quotaMixture(df: DataFrame, strataCol: String, keyCol: String,
                   totalDocs: Long): DataFrame = {
    require(totalDocs >= 0, s"totalDocs must be non-negative: $totalDocs")
    import org.apache.spark.sql.expressions.Window
    val nonNull = df.filter(col(strataCol).isNotNull)
    // tiny (O(distinct strata)); checkpointed because it is read twice
    // (the Σ and the quota rows) and a rescan would repeat the count agg
    val counts = nonNull
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n_stratum"))
      .localCheckpoint()
    val tot = counts.agg(
      round(sum(sqrt(col("n_stratum"))), 6).as("__ts"))
    val quotas = counts.crossJoin(broadcast(tot))
      .select(col(strataCol), col("n_stratum"),
        least(col("n_stratum"),
          floor(lit(totalDocs.toDouble) * sqrt(col("n_stratum"))
            / col("__ts")).cast("long")).as("quota"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5Draw(col(keyCol), "tmix "), col(keyCol))
    nonNull
      .select(col(keyCol), col(strataCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas.drop("n_stratum")), Seq(strataCol))
      .filter(col("rk") <= col("quota"))
      .select(col(keyCol), col(strataCol), col("rk"), col("quota"))
  }
}
