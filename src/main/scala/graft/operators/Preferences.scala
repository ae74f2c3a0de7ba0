package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair (RLHF/DPO) data QA ([EXT]): the structural audits a
  * preference-tuning pipeline runs before (prompt, chosen, rejected)
  * triples reach a trainer — pair validity (identical or empty sides
  * carry zero preference signal), the length-bias report (reward models
  * notoriously learn "longer is better" when chosen responses are
  * systematically longer), token-overlap between the two sides (a
  * near-identical pair is a low-signal gradient), and exact pair
  * deduplication (repeated pairs over-weight their prompt).
  *
  * Per-pair checks are pure Column expressions over the two response
  * columns (token arrays or strings) — zero shuffles, zero UDFs; the
  * reports are single hash aggregates. At 100 TB the per-pair pass is a
  * narrow scan-side stage exactly like the text quality gates
  * (ref analogue: the flag-column style of MqReports' completeness
  * passes), and the dedup is the exact-group shape of
  * [[Dedup.exactGroups]] keyed on (prompt, chosen) instead of text.
  */
object Preferences {

  /** Byte-identical chosen/rejected — zero preference signal. */
  def identicalPair(chosen: Column, rejected: Column): Column =
    chosen === rejected

  /** Jaccard similarity of the two sides' DISTINCT token sets, in
    * integer micro-units (floor(1e6 * |A∩B| / |A∪B|); 0 when the union
    * is empty). Integer output keeps the per-pair value bit-exact
    * cross-engine; near-1e6 pairs are duplicates-in-spirit even when
    * not byte-identical.
    */
  def tokenJaccardMicro(chosenToks: Column, rejectedToks: Column): Column = {
    val inter = size(array_intersect(array_distinct(chosenToks),
      array_distinct(rejectedToks)))
    val uni = size(array_union(chosenToks, rejectedToks))
    when(uni === 0, 0L)
      .otherwise(floor(inter.cast("long") * 1000000L / uni))
      .cast("long")
  }

  /** Per-pair QA columns over (chosen, rejected) strings + token arrays.
    * Emits the flags a filter consumes plus the evidence columns an
    * audit reads. `valid` = both sides non-empty AND not byte-identical
    * — the minimal bar for a DPO gradient.
    */
  def pairFlags(df: DataFrame, chosenStr: Column, rejectedStr: Column,
                chosenToks: Column, rejectedToks: Column): DataFrame = {
    val cChars = length(chosenStr).cast("long")
    val rChars = length(rejectedStr).cast("long")
    df
      .withColumn("chosen_chars", cChars)
      .withColumn("rejected_chars", rChars)
      .withColumn("n_chosen_toks", size(chosenToks).cast("long"))
      .withColumn("n_rejected_toks", size(rejectedToks).cast("long"))
      .withColumn("identical", identicalPair(chosenStr, rejectedStr))
      .withColumn("empty_chosen", cChars === 0L)
      .withColumn("empty_rejected", rChars === 0L)
      .withColumn("chosen_longer", cChars > rChars)
      .withColumn("tok_jaccard_micro",
        tokenJaccardMicro(chosenToks, rejectedToks))
      .withColumn("valid",
        !col("identical") && !col("empty_chosen") && !col("empty_rejected"))
  }

  /** Length-bias / health report grouped by `srcCol` over a
    * [[pairFlags]] frame: pair counts, invalidity breakdown, the
    * chosen-longer win fraction among valid pairs (THE length-bias
    * number), mean char diff, and mean token-overlap among valid pairs.
    * Fractions are 6-decimal roundings of integer-count divisions —
    * exact cross-engine. One hash aggregate; at scale this collapses
    * map-side (few sources).
    */
  def lengthBiasReport(flagged: DataFrame, srcCol: String): DataFrame = {
    val validL = col("valid").cast("long")
    flagged.groupBy(col(srcCol))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(validL).as("n_valid"),
        sum(col("identical").cast("long")).as("n_identical"),
        sum(col("empty_chosen").cast("long")).as("n_empty_chosen"),
        sum((col("chosen_longer") && col("valid")).cast("long"))
          .as("n_chosen_longer"),
        sum(when(col("valid"), col("chosen_chars") - col("rejected_chars"))
          .otherwise(0L)).as("char_diff_sum"),
        sum(when(col("valid"), col("tok_jaccard_micro")).otherwise(0L))
          .as("jaccard_micro_sum"))
      .select(
        col(srcCol),
        col("n_pairs"), col("n_valid"), col("n_identical"),
        col("n_empty_chosen"),
        round(col("n_chosen_longer").cast("double") / col("n_valid"), 6)
          .as("frac_chosen_longer"),
        round(col("char_diff_sum").cast("double") / col("n_valid"), 6)
          .as("avg_char_diff"),
        round(col("jaccard_micro_sum").cast("double")
          / col("n_valid") / 1e6, 6).as("avg_tok_jaccard"))
  }

  /** Exact pair dedup: one row per distinct (prompt, chosen) with the
    * copy count and the canonical (minimum) id — the keeper a pipeline
    * retains. The [[Dedup.exactGroups]] shape on the pair key; only
    * (prompt, chosen, id) shuffles.
    */
  def exactPairGroups(df: DataFrame, promptCol: String, chosenCol: String,
                      idCol: String): DataFrame =
    df.groupBy(col(promptCol), col(chosenCol))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** Best-of-n selection ([EXT]): the rejection-sampling reduction — a
    * prompt's n scored candidate responses collapse to the argmax
    * (score DESC, candidate-id ASC tie-break) plus the margin to the
    * runner-up (the confidence signal an RLHF pipeline thresholds;
    * margin 0 when n == 1). Expects `array<struct<score:bigint,
    * cand:int>>`; pure array expressions — the whole selection is a
    * narrow per-row pass, no window, no shuffle.
    */
  def bestOfN(cands: Column): Column = {
    val keyed = array_sort(transform(cands, c => struct(
      (-c.getField("score")).as("k"),
      c.getField("cand").as("cand"))))
    val best = element_at(keyed, 1)
    val second = when(size(keyed) >= 2, element_at(keyed, 2)).otherwise(best)
    struct(
      best.getField("cand").as("best_cand"),
      (-best.getField("k")).as("best_score"),
      (second.getField("k") - best.getField("k")).as("margin"),
      size(cands).as("n_cands"))
  }

  /** Response-reuse report: chosen responses appearing under more than
    * one DISTINCT prompt (a reward-hacking / template-response smell —
    * one canned answer winning everywhere). Only (chosen, prompt)
    * shuffles; the distinct collapses map-side per partition.
    */
  def responseReuse(df: DataFrame, promptCol: String,
                    chosenCol: String): DataFrame =
    df.groupBy(col(chosenCol))
      .agg(countDistinct(col(promptCol)).as("n_prompts"),
        count(lit(1)).as("n_pairs"))
      .where(col("n_prompts") > 1)
}
