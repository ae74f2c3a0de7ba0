package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Single-file CSV report with header + manifest sidecar (reference
  * MqReports.scala:136-158): `coalesce(1)` so downstream consumers get one
  * file — correct only because score reports are O(#providers) rows; the
  * writer asserts that assumption instead of silently serializing a huge
  * frame through one task.
  */
object CsvReport {

  def write(
      df: DataFrame,
      outDir: String,
      manifestOpts: Map[String, String],
      timestamp: String,
      maxRows: Long = 1000000L): Long = {
    // persist: the count gate and the write would otherwise each run the
    // full upstream aggregation (the same double-compute the reference's
    // MqReports pays 4× over — SURVEY.md §3.2)
    val cached = df.persist()
    try {
      val n = cached.count()
      require(n <= maxRows,
        s"CsvReport is a single-file sink; got $n rows > $maxRows. " +
          "Use df.write.csv directly for large outputs.")
      cached.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(outDir)
      Manifest.write(
        df.sparkSession.sparkContext.hadoopConfiguration, outDir,
        manifestOpts + ("Count" -> n.toString), timestamp)
      n
    } finally { cached.unpersist(); () }
  }
}
