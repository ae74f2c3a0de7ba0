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
    val n = df.count()
    require(n <= maxRows,
      s"CsvReport is a single-file sink; got $n rows > $maxRows. " +
        "Use df.write.csv directly for large outputs.")
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(outDir)
    Manifest.write(
      df.sparkSession.sparkContext.hadoopConfiguration, outDir,
      manifestOpts + ("Count" -> n.toString), timestamp)
    n
  }
}
