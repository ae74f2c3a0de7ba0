package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus data-card report ([EXT]): the per-source summary a curation run
  * publishes next to the dataset — volume, token mass, duplication level,
  * dominant language and its share. The reference's completeness-report
  * habit (MqReports.scala:22-134 — per-provider metric rollups shipped as
  * a CSV) applied to the training-corpus axes instead of DPLA metadata
  * fields.
  *
  * Scale shape: two hash aggregations over the corpus (the per-source
  * stats and the per-(source, lang) counts) and one join on #sources
  * rows — no window over raw documents, no collect. The lang-mode rank
  * runs on the already-aggregated (source, lang) frame, so the window
  * partition count is #sources and each partition holds #langs rows.
  */
object CorpusReport {

  /** One row per source: (source, n_docs, n_tokens, avg_tokens,
    * dup_ratio, top_lang, top_lang_share). `dup_ratio` is the fraction of
    * docs whose normalized-text fingerprint repeats an earlier doc's
    * (1 − distinct/total); `top_lang` ties break toward the smaller lang
    * string. Doubles round to 4 decimals for cross-engine comparison.
    */
  def dataCard(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val base = docs
      .filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(size(toks)), lit(0)).cast("long").as("n_tokens"),
        round(avg(size(toks)), 4).as("avg_tokens"),
        round(lit(1.0) -
          count_distinct(TextAnalysis.fingerprint(col(textCol)))
            .cast("double") / count(lit(1)), 4).as("dup_ratio"))
    val langCounts = docs
      .filter(col(sourceCol).isNotNull && col(langCol).isNotNull)
      .groupBy(col(sourceCol).as("source"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("lc"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("lc").desc, col("lang"))
    val top = langCounts
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("lc"))
    base.join(top, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("avg_tokens"), col("dup_ratio"), col("top_lang"),
        round(col("lc").cast("double") / col("n_docs"), 4)
          .as("top_lang_share"))
  }
}
