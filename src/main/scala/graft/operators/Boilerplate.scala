package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide boilerplate line removal ([EXT]) — the C4/RefinedWeb-style
  * cleaning step: a line that appears verbatim (space-trimmed) in at least
  * `minDocs` DISTINCT documents is navigation/footer/cookie-banner
  * boilerplate, and every occurrence is stripped while the rest of each
  * document survives in order.
  *
  * Scale design (100 TB):
  *  - discovery is the [[HeavyHitters]] shape: a Count-Min sketch over
  *    line OCCURRENCES is fitted in one narrow-aggregate pass (a few KB of
  *    partial state per task), and only CMS-candidate lines reach the
  *    exact distinct-doc count — occurrences >= doc-frequency and CMS
  *    never undercounts, so the candidate set is a superset of the true
  *    heavy lines and the final count is EXACT;
  *  - the fitted line set is a bounded collect (`maxHeavyLines` cap
  *    enforced with the limit(cap+1) pattern — one job, at most cap+1
  *    rows to the driver) that becomes a LITERAL plan value;
  *  - cleaning is one codegen pass per document
  *    ([[graft.plans.StripLines]]): split, probe each trimmed line
  *    against the literal hash set, rejoin — no explode, no join, no
  *    shuffle; the only exchanges in the whole job belong to the bounded
  *    discovery aggregation.
  *
  * Blank lines are never boilerplate (paragraph structure survives), and
  * lines containing a tab are excluded from the fitted set (the literal
  * serialization is tab-delimited) — both exclusions are part of the
  * operator contract and mirrored by the DuckDB oracle.
  *
  * Like [[HeavyHitters]], exactness requires a DETERMINISTIC input frame
  * (discovery scans it twice); persist nondeterministic inputs first.
  */
object Boilerplate {

  /** Exact (line, df) for space-trimmed non-blank lines appearing in at
    * least `minDocs` distinct documents.
    */
  def heavyLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Long,
      eps: Double = 1e-4,
      seed: Int = 42): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val lines = Similarity.spreadIfNarrow(
        docs.filter(col(textCol).isNotNull))
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), "\n")).as("__raw"))
      .select(col("__id"), trim(col("__raw")).as("__ln"))
      .filter(col("__ln") =!= "" && !col("__ln").contains("\t"))
    val sketchBytes: Array[Byte] = lines
      .agg(expr(s"count_min_sketch(__ln, ${eps}d, 0.99d, $seed)").as("__cms"))
      .head().getAs[Array[Byte]]("__cms")
    if (sketchBytes == null) // empty corpus: no aggregate row content
      return lines.limit(0).select(col("__ln").as("line"),
        lit(0L).as("df"))
    lines
      // occurrences bound doc frequency from above, so the CMS occurrence
      // prefilter keeps a superset of lines with df >= minDocs
      .filter(call_function("graft_cms_atleast",
        col("__ln"), lit(sketchBytes), lit(minDocs)))
      .select(col("__id"), col("__ln")).distinct()
      .groupBy(col("__ln"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("__ln").as("line"), col("df"))
  }

  /** Strip every discovered boilerplate line from every document:
    * (idCol, clean_text, n_dropped). Null-text rows pass through with
    * null clean_text and null n_dropped.
    *
    * @param maxHeavyLines cap on the fitted set (it rides the plan as one
    *                      literal); discovery past the cap fails fast
    *                      instead of OOMing the driver.
    */
  def stripBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Long,
      eps: Double = 1e-4,
      maxHeavyLines: Int = 100000): DataFrame = {
    require(maxHeavyLines >= 1,
      s"maxHeavyLines must be positive, got $maxHeavyLines")
    val heavyRows = heavyLines(docs, idCol, textCol, minDocs, eps)
      .limit(maxHeavyLines + 1)
      .collect().map(_.getString(0))
    require(heavyRows.length <= maxHeavyLines,
      s"boilerplate discovery found more than $maxHeavyLines heavy lines " +
        "— raise minDocs or maxHeavyLines (the set ships as one plan " +
        "literal)")
    val spark = docs.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val table = graft.plans.ScoreTable.serialize(
      heavyRows.toIndexedSeq.map(_ -> 1.0), 0.0)
    Similarity.spreadIfNarrow(docs)
      .select(col(idCol),
        call_function("graft_strip_lines", col(textCol), lit(table))
          .as("__s"))
      .select(col(idCol),
        col("__s.clean").as("clean_text"),
        col("__s.dropped").cast("long").as("n_dropped"))
  }
}
