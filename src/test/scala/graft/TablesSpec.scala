package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The per-session analyzed-DataFrame cache in [[Tables.table]]: identity
  * reuse, and — the risk the cache introduces — self-joins of the SAME
  * DataFrame instance still analyzing and producing correct results
  * (DeduplicateRelations must disambiguate the reused plan).
  */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("repeated table() calls return the same cached instance") {
    val a = Tables.table(spark, sf, "region")
    val b = Tables.table(spark, sf, "region")
    assert(a eq b)
    // distinct paths stay distinct entries
    val c = Tables.table(spark, sf, "nation")
    assert(!(a eq c))
  }

  test("self-join of the cached instance resolves and is correct") {
    val n = Tables.table(spark, sf, "nation")
    val m = Tables.table(spark, sf, "nation")
    assert(n eq m)
    // derive both sides from the SAME cached object, as two query
    // authors sharing a session would
    val a = n.select(col("n_nationkey").as("k"), col("n_regionkey"))
    val b = m.select(col("n_nationkey"), col("n_regionkey").as("r2"))
    val joined = a.join(b, a("k") === b("n_nationkey"))
    assert(joined.count() === n.count())
    // join on the shared region key: row count must match the exact
    // per-region self-pairing sum computed independently
    val byRegion = n.groupBy(col("n_regionkey")).count()
      .collect().map(_.getLong(1)).map(c => c * c).sum
    val pairs = n.select(col("n_regionkey"))
      .join(m.select(col("n_regionkey").as("rk")),
        col("n_regionkey") === col("rk"))
    assert(pairs.count() === byRegion)
  }

  test("cached events table keeps the normalized timestamp type") {
    val e1 = Tables.table(spark, sf, "events")
    val e2 = Tables.table(spark, sf, "events")
    assert(e1 eq e2)
    assert(e1.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }
}
