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
  * plus every single-character deletion).
  *
  * Plan shape — pair KEYS, then fan out to ids. Because every id carries
  * exactly one key, the id-pair relation factors through the key-pair
  * relation: (i, j) match iff (key(i), key(j)) match, and each unordered
  * id pair arises from exactly one unordered key pair. So the quadratic
  * machinery (variant explode, equi-join, Levenshtein verify, dedup)
  * runs over the DISTINCT-KEY frame — never larger than the corpus, and
  * on real id corpora (URLs, titles) orders of magnitude smaller — and
  * the corpus itself is only touched by two equi-joins at the end that
  * materialize the output fan-out. No per-candidate Levenshtein on id
  * pairs, no id-pair `distinct` exchange (uniqueness is structural), no
  * persisted intermediate: the old plan paid three wide passes over the
  * exploded id-level variant frame before forming a single pair.
  *
  * Skew: a variant shared by B ids expands to O(B²) candidate id pairs.
  * `maxBucket` drops variants whose ID-level occurrence count (the sum
  * of key-group sizes over keys sharing the variant) exceeds the cap —
  * identical semantics to capping the id-level variant buckets directly,
  * since a variant's id bucket is exactly the union of its key groups.
  * Identical keys still pair through their other variants unless every
  * shared variant is capped.
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
    * neighborhood equi-join over DISTINCT keys (see object scaladoc).
    * Output column names: id_a, id_b, dist.
    */
  def pairsWithin1(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      maxBucket: Int = 10000): DataFrame = {
    require(maxBucket > 0, s"maxBucket must be positive, got $maxBucket")
    // null ids must go with null keys: a null id survives the cross-key
    // pair filter (its inequality with any id is null, not false) and
    // least/greatest SKIP nulls, so a (null, 5) pair would collapse to a
    // degenerate (5, 5) self-pair feeding downstream clustering
    val keyed = df.select(col(idCol).as("__id"), col(keyCol).as("__key"))
      .filter(col("__key").isNotNull && col("__id").isNotNull)
    // distinct keys with their id-group sizes: map-side combine makes the
    // exchange distinct-key-sized, the only aggregation the corpus pays
    val keyCounts = keyed.groupBy(col("__key"))
      .agg(count(lit(1)).as("__kn"))
    val kvars = keyCounts.select(col("__key"), col("__kn"),
      explode(deleteVariants(col("__key"))).as("__var"))
    // the id-level cap, computed without touching id-level rows: a
    // variant's id bucket is the union of its key groups, so its size is
    // sum(__kn). Singleton buckets can't pair and drop in the same pass.
    val kept = kvars.groupBy(col("__var"))
      .agg(sum(col("__kn")).as("__vn"))
      .filter(col("__vn").between(2, maxBucket))
      .select(col("__var"))
    // key-level candidate pairs: tiny frames (distinct keys × ~len+1
    // variants), verified ONCE per key pair. key_a <= key_b keeps the
    // same-key (distance-0) pair exactly once.
    val keyPairs = kvars.select(col("__key").as("key_a"), col("__var"))
      .join(kept, Seq("__var"))
      .join(kvars.select(col("__key").as("key_b"), col("__var")), Seq("__var"))
      .filter(col("key_a") <= col("key_b"))
      .select(col("key_a"), col("key_b")).distinct()
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("dist") <= 1)
    // fan out to ids: each unordered id pair appears exactly once (one
    // key pair per id pair; same-key pairs ordered by the id filter,
    // cross-key pairs canonicalized by least/greatest) — no distinct.
    // Catalyst broadcasts whichever side is small: at fixture scale both
    // joins are broadcasts and the corpus never shuffles.
    keyed.select(col("__id").as("__ia"), col("__key").as("key_a"))
      .join(keyPairs, Seq("key_a"))
      .join(keyed.select(col("__id").as("__ib"), col("__key").as("key_b")),
        Seq("key_b"))
      .filter(col("key_a") =!= col("key_b") || col("__ia") < col("__ib"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        col("dist"))
  }
}
