package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy key matching ([EXT]): all pairs of rows whose join keys are
  * within Levenshtein distance 1 — the entity-resolution step for
  * near-identical identifiers (crawl URLs with a typo'd char, OCR'd
  * titles, catalog ids) where exact dedup misses and full similarity
  * machinery is overkill.
  *
  * Candidate generation is the SymSpell deletion-neighborhood property:
  * two strings within edit distance 1 (insert/delete/substitute) share at
  * least one member of their delete-1 neighborhoods (the string itself
  * plus every single-character deletion). So the plan is the same
  * two-stage shape as every dedup path here: a NARROW per-row variant
  * fan-out (len+1 variants per key — pure array expressions, no UDF), an
  * equi-join on the variant, pair dedup, and an exact Levenshtein verify
  * on the candidates only. Never all-pairs.
  *
  * Skew: a variant shared by B keys expands to O(B²) candidate pairs
  * before the verify. `maxBucket` drops variant buckets above the cap
  * (same recall-bounding posture as the LSH bucket cap); identical keys
  * always still pair through their other variants unless every shared
  * variant is capped.
  */
object FuzzyJoin {

  /** Delete-1 neighborhood of a key: the key plus each single-char
    * deletion. Guarded for empty keys (Spark's `sequence(1, 0)` DESCENDS
    * rather than being empty).
    */
  def deleteVariants(key: Column): Column =
    when(length(key) < 1, array(key)).otherwise(
      array_union(
        array(key),
        transform(sequence(lit(1), length(key)), i =>
          concat(key.substr(lit(1), i - 1),
            key.substr(i + 1, length(key) - i)))))

  /** Pairs (idA, idB, dist) with idA < idB and
    * `levenshtein(key_a, key_b) <= 1`, found via the deletion-
    * neighborhood equi-join. Output column names: id_a, id_b, dist.
    */
  def pairsWithin1(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      maxBucket: Int = 10000): DataFrame = {
    require(maxBucket > 0, s"maxBucket must be positive, got $maxBucket")
    val keyed = df.select(col(idCol).as("__id"), col(keyCol).as("__key"))
      .filter(col("__key").isNotNull)
    // persisted like lshCandidatePairs' buckets: the cap count and both
    // join sides read the exploded frame; same cache-lifecycle contract
    val vars = keyed.select(col("__id"), col("__key"),
      explode(deleteVariants(col("__key"))).as("__var"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cap degenerate variant buckets BEFORE pair expansion; singleton
    // buckets can't pair and are dropped in the same pass
    val kept = vars.groupBy(col("__var"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn").between(2, maxBucket))
      .select(col("__var"))
    val bounded = vars.join(kept, Seq("__var"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bounded.select(col("__id").as("id_a"), col("__key").as("key_a"),
      col("__var"))
    val b = bounded.select(col("__id").as("id_b"), col("__key").as("key_b"),
      col("__var"))
    // verify BEFORE the pair dedup: the levenshtein runs codegen'd in
    // the join stage (paying it per duplicated candidate — a pair
    // appears once per shared variant), which narrows the distinct's
    // exchange from (2 longs + both key strings) to 3 longs and drops
    // non-matching candidates before they shuffle at all. On the sf0.1
    // fixture (5.3M candidate rows) wall time is unchanged — the
    // exchange is row-count-bound there, not byte-bound — but at scale
    // the bytes-per-row saving is the difference between shuffling ids
    // and shuffling the key corpus; the trade reverses only for very
    // long keys (O(len²) edit distance × duplication vs shipping the
    // strings once) — hash such keys first. distinct over (id_a, id_b,
    // dist) == distinct over the pair: dist is a function of the pair.
    a.join(b, Seq("__var"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }
}
