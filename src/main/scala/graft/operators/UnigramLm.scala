package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring ([EXT]): the perplexity-flavored
  * filter a training-data pipeline runs after the cheap ratio heuristics —
  * score every document by its average negative log-likelihood under a
  * corpus-wide unigram model; gibberish and boilerplate-stuffed documents
  * land far from the fluent-band and get gated.
  *
  * Scale design (100 TB):
  *  - model fit: one token-count aggregation (explode → groupBy(token),
  *    map-side combined so the exchange moves distinct tokens per
  *    partition, not occurrences), then the top-K vocabulary + total are
  *    collected — bounded by vocabSize, a fit-style eager step like the
  *    IVF centroids and the Bloom build;
  *  - scoring: the vocabulary becomes a LITERAL map, so the per-document
  *    score is one narrow codegen'd `aggregate` fold over the token
  *    array — no explode, no join, no shuffle; the output is one row per
  *    document straight from the scan.
  * Out-of-vocabulary tokens get a count floor of 1 (they cannot be liked
  * more than the rarest vocab word).
  */
object UnigramLm {

  /** Top-K unigram vocabulary with counts; deterministic tie-break
    * (count desc, token asc).
    */
  def vocabulary(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t"))
      .limit(vocabSize)

  /** (idCol, avg_nll, n_tokens) for every document with at least one
    * token; `avg_nll` is rounded to 4 decimals so the left-to-right fold
    * hash-compares across engines.
    */
  def scores(docs: DataFrame, textCol: String, idCol: String,
      vocabSize: Int = 1000): DataFrame = {
    // persist the distinct-token counts: the vocab top-K and the total
    // are two actions over the same aggregate, and without the cache the
    // full tokenize/explode/shuffle pass over the corpus would run twice
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fit-style eager step: bounded vocab + one scalar
    val (vocabRows, total) =
      try {
        (counts.orderBy(col("c").desc, col("t")).limit(vocabSize).collect(),
          counts.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0))
      } finally { counts.unpersist(); () }
    if (total == 0L || vocabRows.isEmpty) {
      return docs.select(col(idCol), lit(0.0).as("avg_nll"),
        lit(0L).as("n_tokens")).limit(0)
    }
    val vmap = map_from_arrays(
      array(vocabRows.map(r => lit(r.getString(0))).toIndexedSeq: _*),
      array(vocabRows.map(r => lit(r.getLong(1))).toIndexedSeq: _*))
    val toks = TextAnalysis.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) > 0)
      .select(col(idCol),
        round(
          aggregate(col("__t"), lit(0.0), (acc, t) =>
            acc - log(coalesce(element_at(vmap, t).cast("double"), lit(1.0))
              / lit(total.toDouble)))
            / size(col("__t")), 4).as("avg_nll"),
        size(col("__t")).cast("long").as("n_tokens"))
  }
}
