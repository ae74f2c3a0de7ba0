package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the fixed cost every document-table query pays before any
  * operator work: scan, text decode, and the spread exchange. Diagnostic
  * only. Usage: `runMain graft.tools.ScanProbe [sfDir]`
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = graft.sources.Tables.table(spark, sfDir, "documents")
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("table() construction only")(
      graft.sources.Tables.table(spark, sfDir, "documents"))
    val pinned = docs
    time("count on pinned DF")(pinned.count())
    def timeN(label: String, n: Int)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9 / n}%.4f s/op over $n")
    }
    timeN("repeated count, AQE on", 20)(pinned.count())
    spark.conf.set("spark.sql.ui.explainMode", "simple")
    spark.conf.set("spark.sql.maxPlanStringLength", "1024")
    timeN("repeated count, AQE on + simple explain", 20)(pinned.count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timeN("repeated count, AQE off", 20)(pinned.count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val rdd = pinned.queryExecution.toRdd
    timeN("bare RDD count (no SQL layer)", 20)(rdd.count())
    time("count only")(docs.count())
    time("decode text (sum length)")(
      docs.agg(sum(length(col("text")))).head())
    time("spread + count")(
      graft.operators.Similarity.spreadIfNarrow(docs).count())
    time("spread + decode")(
      graft.operators.Similarity.spreadIfNarrow(docs)
        .agg(sum(length(col("text")))).head())
    time("spread + tokens")(
      graft.operators.Similarity.spreadIfNarrow(docs)
        .agg(sum(size(graft.operators.TextAnalysis.tokens(col("text")))))
        .head())
    spark.stop()
  }
}
