package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: the SparkEntry maps are built by ++-merging the
  * per-family query/oracle maps, and a duplicate key across families is
  * SILENT — the later map's entry shadows the earlier one and a whole
  * oracled query vanishes from the driver contract without any error
  * (this nearly happened in round 10: a second "q_temp_mixture" would
  * have shadowed the existing epoch-mixture query). These gates make the
  * collision loud. No Spark session needed — pure map arithmetic.
  */
class RegistrySpec extends AnyFunSuite {

  private def queryMaps = Seq(
    "RelationalQueries" -> graft.queries.RelationalQueries.queries.keySet,
    "TextQueries" -> graft.queries.TextQueries.queries.keySet,
    "VectorQueries" -> graft.queries.VectorQueries.queries.keySet,
    "SchemaQueries" -> graft.queries.SchemaQueries.queries.keySet,
    "MediaQueries" -> graft.queries.MediaQueries.queries.keySet,
    "ConvQueries" -> graft.queries.ConvQueries.queries.keySet,
    "PrefQueries" -> graft.queries.PrefQueries.queries.keySet,
    "DqQueries" -> graft.queries.DqQueries.queries.keySet,
    "DqQueries.ref" -> graft.queries.DqQueries.refQueries.keySet,
    "ProfilingQueries" -> graft.queries.ProfilingQueries.queries.keySet)

  test("no query key is defined by two families (merge would shadow one)") {
    val all = queryMaps.flatMap { case (fam, ks) => ks.map(_ -> fam) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicate query keys across families: " +
        dups.map { case (k, fams) =>
          s"$k in ${fams.map(_._2).mkString("+")}" }.mkString(", "))
  }

  test("every oracle key has a query; registry names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    val badNames = qs.filterNot(_.matches("[a-z0-9_]+"))
    assert(badNames.isEmpty, s"non-kebab registry names: $badNames")
  }

  test("rowsOnly is exactly the oracle-less remainder of the registry") {
    val qs = SparkEntry.queries.keySet
    // every declared rows-only query exists and has NO oracle
    val ghosts = SparkEntry.rowsOnly.diff(qs)
    assert(ghosts.isEmpty, s"rowsOnly entries without a query: $ghosts")
    val shadowed = SparkEntry.rowsOnly.intersect(SparkEntry.oracleSql.keySet)
    assert(shadowed.isEmpty,
      s"rowsOnly entries that DO have an oracle: $shadowed")
    // and nothing is oracle-less without being declared — a new query
    // missing its oracle must fail loudly here, not surface as a silent
    // rows-only row in the driver's correctness report. Exception: the
    // fitted-model oracles (BPE merges, PQ codebook) are built from the
    // fit memo and omitted while cold — this spec JVM never fits, so
    // those keys are absent HERE but present in every real Verify dump.
    val fittedDynamic = Set("q_bpe_encode", "q_bpe_fertility",
      "q_bpe_lossless", "q_pack_bpe", "q_pq_codes", "q_ann_pq_md5",
      "q_ivfpq_codes", "q_ann_ivfpq_md5", "q_ann_ivfpq_pers_md5",
      "q_ann_ivfpq_incr_md5", "q_ivfpq_code_drift", "q_ivfpq_policy",
      "q_ann_ivfpq_refine_md5", "q_ann_ivfpq_del_md5")
    val undeclared = qs.diff(SparkEntry.oracleSql.keySet)
      .diff(SparkEntry.rowsOnly).diff(fittedDynamic)
    assert(undeclared.isEmpty,
      s"oracle-less queries not declared rows-only: $undeclared")
  }
}
