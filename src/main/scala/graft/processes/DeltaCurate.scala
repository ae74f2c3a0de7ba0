package graft.processes

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, SnapshotDiff}

/** Incremental snapshot curation ([EXT]) — the monthly-delta shape: when a
  * new corpus snapshot lands, do NOT re-curate the world; diff it against
  * the previous snapshot, push only the added/changed documents through
  * the quality gate, and dedup them against the PERSISTED fingerprint and
  * signature indexes that earlier increments built.
  *
  * At 100 TB this is the difference between a petabyte job and a job
  * proportional to the month's churn: the diff exchanges (id, digest)
  * pairs only, the index joins are one-sided (history is bucketed and
  * never moves — see [[graft.operators.Dedup.incrementalExact]] /
  * [[graft.operators.Dedup.incrementalNearDupMd5]]), and the quality
  * gate is a narrow predicate over just the delta.
  *
  * Changed documents re-enter curation under their (unchanged) ids; their
  * superseded fingerprints/signatures remain in the index, which gives
  * the conservative dedup semantics on purpose: a COSMETIC edit (near-dup
  * of the document's own previous version) is suppressed — the corpus
  * keeps the prior version — while a material rewrite passes. Compaction
  * of dead fingerprints is a maintenance task, not a correctness one.
  */
object DeltaCurate {

  final case class Result(
      added: Long,
      changed: Long,
      removed: Long,
      gated: Long,
      survivors: DataFrame)

  /** Curate the delta between `prevSnap` and `newSnap` against the
    * persisted `fpIndexTable` / `sigIndexTable` (bootstrapped on first
    * use). Returns counts plus the surviving, deduped delta documents.
    */
  def run(
      prevSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      cfg: Curation.Config = Curation.Config(),
      fpIndexTable: String = "graft_fp_index",
      sigIndexTable: String = "graft_sig_index",
      buckets: Int = 64): Result = {
    val statuses = SnapshotDiff.diff(prevSnap, newSnap, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = statuses.groupBy(col("status")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the delta: documents the previous snapshot did not have in this form
    val delta = newSnap.join(
      statuses.filter(col("status").isin("added", "changed"))
        .select(col(idCol)),
      Seq(idCol), "left_semi")
    val gated = Curation.qualityFilter(delta, textCol, langCol, cfg)
    val gatedN = gated.count()
    // one-sided index dedup: exact first (cheap digest anti-join), then
    // near-dup signatures over what remains; both append their survivors
    // so the NEXT delta sees this month's documents as history
    val exactFresh = Dedup.incrementalExact(
      gated, textCol, idCol, fpIndexTable, buckets)
    val survivors = Dedup.incrementalNearDupMd5(
      exactFresh, textCol, idCol, sigIndexTable,
      threshold = cfg.nearDupThreshold, buckets = buckets)
    statuses.unpersist()
    Result(
      added = counts.getOrElse("added", 0L),
      changed = counts.getOrElse("changed", 0L),
      removed = counts.getOrElse("removed", 0L),
      gated = gatedN,
      survivors = survivors)
  }
}
