package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot content diff ([EXT]) — the audit a periodically
  * re-exported corpus publishes between versions (the reference pipeline
  * re-exports a full snapshot per run; see the latest-snapshot discovery
  * in `sources/Catalog.scala`): which documents were added, removed, or
  * changed, by id + content fingerprint.
  *
  * Scale shape: each side reduces to (id, 16-byte md5 fingerprint) IN
  * TASK before anything joins — the full-outer join exchanges digests,
  * never document bodies, so diffing two 100 TB snapshots moves
  * O(ids × 16 bytes). Status logic is null-safe: a document whose text
  * is null on both sides is `unchanged` (`<=>` treats null = null), and
  * presence is tracked with explicit flags, not fingerprint nullity, so
  * null-text documents still diff correctly.
  */
object SnapshotDiff {

  /** Per-id status between two snapshots: `added` (new only), `removed`
    * (old only), `changed` (both, different fingerprint), `unchanged`.
    * Output: (idCol, status).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("__fpo"), lit(true).as("__po"))
    val n = newDf.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("__fpn"), lit(true).as("__pn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__pn").isNull, lit("removed"))
          .when(col("__po").isNull, lit("added"))
          .when(col("__fpo") <=> col("__fpn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Status counts: (status, n) — the four-line audit summary. */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
