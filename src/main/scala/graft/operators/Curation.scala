package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation ([EXT]): the composed pipeline a
  * 100 TB corpus actually runs before pre-training —
  *
  *   quality filter → language filter → exact dedup → near-dup dedup →
  *   deterministic train/test split
  *
  * Each stage is one of the engine's own operators (TextAnalysis, Dedup,
  * Sampling), composed so the whole thing stays a handful of narrow maps
  * plus the two dedup shuffles:
  *  - quality + language filters are codegen'd scan-side predicates
  *    (pushdown-friendly, drop rows before anything shuffles);
  *  - exact dedup shuffles 16-byte digests, keeps the min-id row per
  *    fingerprint;
  *  - near-dup dedup uses MinHash+LSH candidates (never all-pairs) and
  *    drops the higher id of each verified pair;
  *  - the split is key-hash based, so reruns reproduce it exactly.
  */
object Curation {

  final case class Config(
      minTokens: Int = 30,
      maxStopRatio: Double = 0.6,
      langs: Seq[String] = Seq("en"),
      nearDupThreshold: Double = 0.8,
      testFraction: Double = 0.1)

  /** Quality + language gate (pure narrow predicate). */
  def qualityFilter(docs: DataFrame, textCol: String, langCol: String,
      cfg: Config): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    docs.filter(col(langCol).isin(cfg.langs: _*) &&
      size(toks) >= cfg.minTokens &&
      TextAnalysis.stopwordRatio(toks) <= cfg.maxStopRatio)
  }

  /** Exact dedup keeping the lowest id per content fingerprint. */
  def dropExactDups(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Near-dup removal: LSH candidates verified by n-gram Jaccard; the
    * HIGHER id of each pair ≥ threshold is dropped (anti join on the id).
    */
  def dropNearDups(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val losers = Dedup.nearDupPairs(docs, textCol, idCol, threshold)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Full pipeline → (train, test). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, cfg: Config = Config()): (DataFrame, DataFrame) = {
    val cleaned = dropNearDups(
      dropExactDups(
        qualityFilter(docs, textCol, langCol, cfg), textCol, idCol),
      textCol, idCol, cfg.nearDupThreshold)
    Sampling.trainTestSplit(cleaned, idCol, cfg.testFraction)
  }
}
