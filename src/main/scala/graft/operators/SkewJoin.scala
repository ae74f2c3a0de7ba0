package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting (SURVEY.md §0 scale notes; the
  * standard remedy when one join key holds a disproportionate share of the
  * fact side and AQE's skew-join split isn't available — e.g. the exchange
  * feeds an aggregation, or the skew is in a broadcast-ineligible dim).
  *
  * Left (large, skewed) rows get a DETERMINISTIC salt in [0, buckets) from
  * a hash of the whole row's join tuple position — `monotonically_increasing_id`
  * is avoided on purpose: it changes under retries/repartitioning, while
  * xxhash64 of the row's own columns is stable, keeping results reproducible
  * run to run. The right side replicates `buckets`× via an exploded literal
  * range, so each (key, salt) pair meets exactly one right copy.
  *
  * Cost: right side inflates by the salt factor — choose `buckets` ≈ the
  * skew ratio, and salt only when a key histogram says so.
  */
object SkewJoin {

  /** Inner equi-join on `key` with the left side salted `buckets` ways. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int,
      saltCols: Seq[Column]): DataFrame = {
    require(buckets > 0)
    require(saltCols.nonEmpty,
      "saltCols must be non-empty: an empty hash is a constant, so every " +
        "row lands in salt bucket 0 and the join pays replication for " +
        "no skew mitigation")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs already carry a __salt column; rename it before salting again")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(buckets.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
