package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-resampling data selection ([EXT] — the DSIR shape: select
  * source documents that look like a small high-quality target corpus by
  * the likelihood ratio between a target-fitted and a source-fitted
  * unigram model, then resample with Gumbel noise so selection is soft
  * rather than a hard top-k cut).
  *
  * Model contract (chosen so an independent engine can refit bit-alike):
  *  - vocabulary = top-`vocabSize` tokens of the SOURCE corpus (count
  *    desc, token asc — the [[UnigramLm]] tie-break), plus one OOV
  *    outcome; V = the FITTED vocab size (≤ vocabSize on small corpora).
  *  - both distributions are Laplace-smoothed over those V+1 outcomes:
  *    p(w) = (c_w + 1) / (total + V + 1), with the OOV outcome carrying
  *    the corpus's whole out-of-vocab mass (total − in-vocab sum).
  *  - per-document weight = mean over tokens of ln p_t(w) − ln p_s(w),
  *    rounded to 4 decimals for cross-engine hash comparison.
  *
  * Scale shape (100 TB): two fit-style token-count aggregations (map-side
  * combined; the exchanges move distinct tokens, not occurrences) with
  * bounded top-K/total collects, then scoring is one narrow codegen
  * `graft_map_sum` fold per document — the log-ratio table rides the plan
  * as a literal, so the scoring pass has ZERO shuffles and the corpus
  * never moves. The Gumbel keep-decision is a pure per-row expression on
  * top (an md5 draw, no state), so resampling is also narrow.
  */
object Dsir {

  /** (idCol, logratio, n_tokens) for every source document with ≥ 1
    * token: mean per-token log likelihood ratio target/source, rounded
    * to 4 decimals. Positive ⇒ the document looks more like the target
    * corpus than the source average.
    */
  def importanceScores(
      source: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0 && vocabSize <= 100000,
      s"vocabSize must be in (0, 100000], got $vocabSize")
    val srcSpread = Similarity.spreadIfNarrow(source)
    // source fit: one distinct-token aggregation, persisted because the
    // top-K and the total are two actions over it
    val scnt = srcSpread
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (vocabRows, sTotal) =
      try {
        (scnt.orderBy(col("c").desc, col("t")).limit(vocabSize).collect(),
          scnt.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0))
      } finally { scnt.unpersist(); () }
    if (sTotal == 0L || vocabRows.isEmpty) {
      return source.select(col(idCol), lit(0.0).as("logratio"),
        lit(0L).as("n_tokens")).limit(0)
    }
    val vocab = vocabRows.map(r => r.getString(0) -> r.getLong(1))
    val vocabSet = vocab.iterator.map(_._1).toSet
    // target fit: total over ALL target tokens plus counts restricted to
    // the source vocab — one aggregation, two bounded reads
    val tcnt = target
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (tVocabRows, tTotal) =
      try {
        (tcnt.filter(col("t").isInCollection(vocabSet)).collect(),
          tcnt.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0))
      } finally { tcnt.unpersist(); () }
    val tCounts = tVocabRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // Laplace smoothing over the V+1 outcomes; OOV carries the whole
    // out-of-vocab mass on each side (fitted V, not the cap — the
    // oracle-parity rule)
    val v = vocab.length
    val sDen = (sTotal + v + 1).toDouble
    val tDen = (tTotal + v + 1).toDouble
    def ratio(tc: Long, sc: Long): Double =
      math.log((tc + 1).toDouble / tDen) - math.log((sc + 1).toDouble / sDen)
    val sInVocab = vocab.iterator.map(_._2).sum
    val tInVocab = vocab.iterator
      .map { case (w, _) => tCounts.getOrElse(w, 0L) }.sum
    val table = graft.plans.ScoreTable.serialize(
      vocab.map { case (w, sc) => w -> ratio(tCounts.getOrElse(w, 0L), sc) },
      ratio(tTotal - tInVocab, sTotal - sInVocab))
    graft.plans.GraftFunctions.register(source.sparkSession)
    val toks = TextAnalysis.tokens(col(textCol))
    srcSpread
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) > 0)
      .select(col(idCol),
        // + 0.0 normalizes IEEE −0.0 (a tiny-negative mean rounds to it)
        // so the hash compare can't split on the zero's sign
        (round(
          call_function("graft_map_sum", col("__t"), lit(table))
            / size(col("__t")), 4) + lit(0.0)).as("logratio"),
        size(col("__t")).cast("long").as("n_tokens"))
  }

  /** Gumbel-perturbed keep decision as a pure per-row Column: keep iff
    * weight + g(id) > threshold, where g = −ln(−ln(u)) and u ∈ (0,1) is
    * the deterministic md5 draw (hex8 + 0.5)/2³². Both the weight and the
    * noise are rounded (4 and 6 decimals) before the sum so the
    * comparison is engine-stable. Soft selection: high-weight documents
    * are kept with high probability but low-weight ones still have a
    * chance — the resampling (not top-k) half of the DSIR recipe.
    */
  def gumbelKeep(weight: Column, id: Column, threshold: Double,
      prefix: String = "dsir "): Column = {
    val u = (Sampling.md5Hex8(id, prefix).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val g = round(-log(-log(u)), 6)
    (round(weight, 4) + g) > lit(threshold)
  }

  /** Filter `df` to the Gumbel-kept rows — the resampling step. */
  def gumbelSelect(df: DataFrame, weightCol: String, idCol: String,
      threshold: Double): DataFrame =
    df.filter(gumbelKeep(col(weightCol), col(idCol), threshold))
}
