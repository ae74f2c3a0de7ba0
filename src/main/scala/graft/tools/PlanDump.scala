package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of a registered query — the
  * `.explain("formatted")` companion to [[graft.JobProfile]] (profile says
  * WHERE the time goes, this says what the plan does there). Diagnostic
  * only; not part of the driver contract.
  *
  * Usage: `runMain graft.tools.PlanDump <queryName> [sfDir]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir]")
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
