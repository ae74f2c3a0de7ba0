package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: print the formatted physical plan for selected queries (all
  * by default) so scan pruning (PushedFilters/ReadSchema), broadcast
  * placement, and WholeStageCodegen spans can be eyeballed per round.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ADVICE r11: register graft functions at session bootstrap so a
    // Column built while another (or no) session was active still
    // resolves the graft_* kernels when analyzed against THIS session
    graft.plans.GraftFunctions.register(spark)
    val selected =
      if (names.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(names.contains).toMap
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"\n===================== $name =====================")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
