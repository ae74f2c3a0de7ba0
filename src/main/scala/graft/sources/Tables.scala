package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader for the TPC-H-ish test corpus (TESTDATA.md).
  *
  * Canonical local source is Parquet (the reference's master dataset is Avro
  * on S3 — /root/reference/.../ParquetDump.scala:116 — but no spark-avro jar
  * ships locally, so Parquet is the engine's canonical columnar source; see
  * SURVEY.md §2.A1). All readers go through `spark.read.parquet`, which gives
  * vectorized scans, predicate pushdown, and nested-schema pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"${dir.stripSuffix("/")}/$name.parquet")
}
