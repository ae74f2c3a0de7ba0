package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the harness environment (local[32], 32 shuffle
    // partitions — see the build prompt); override via SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT/codegen/scheduler spin-up otherwise lands on
    // whichever query happens to run first and distorts its number.
    graft.sources.Tables.names.foreach { t =>
      try graft.sources.Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // Two timed runs per query, best-of kept: a single run is hostage to
    // one GC pause / scheduler stall on a shared box (round-1 driver bench
    // showed 30-50x blowups on sub-second queries vs a quiet rerun).
    // optional args = subset of query names (profiling aid; driver passes none)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.contains).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // drop frames the query persisted: carrying them over would (a)
        // hand the rerun a warm cache it didn't pay for and (b) build up
        // memory pressure that distorts later queries (observed 2.5x on
        // q_embed_neardup_lsh inside the full sweep vs standalone)
        spark.catalog.clearCache()
        // a failed query must not masquerade as a fast one
        if (ok) elapsed else -1.0
      }
      // ANY failed run reports -1: a query that fails intermittently must
      // not pass the bench gate on its lucky rerun
      val runs = Seq(once(), once())
      name -> (if (runs.exists(_ < 0)) -1.0 else runs.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query poisons the TOTAL too: silently dropping its seconds
    // would make a crashing query look like a speedup against the baseline
    val total =
      if (results.values.exists(_ < 0)) -1.0 else results.values.sum
    // The full per-query map is ~3 KB with 70+ queries and the harness's
    // stdout tail capture truncated it two rounds running (BENCH_r1/r2
    // parsed:null). So: full detail goes to a sidecar file AND an earlier
    // stdout line that deliberately avoids the "metric" marker, while the
    // FINAL line is a compact always-parseable summary carrying the total
    // plus only the ten slowest queries.
    val detail = s"""{"detail":$qs,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"),
      (detail + "\n").getBytes("UTF-8"))
    println(detail)
    // failures (-1 sentinels) sort FIRST so the compact line names the
    // culprit even when the full map is truncated away
    val slowest = results.toSeq.sortBy { case (_, v) => (v >= 0, -v) }
      .take(10)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${results.size},"queries_truncated":${results.size > 10},"queries":$slowest,"sf":"$sfDir","detail_file":"bench_detail.json"}""")
    spark.stop()
  }
}
