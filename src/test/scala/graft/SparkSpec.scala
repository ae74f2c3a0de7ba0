package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for ScalaTest specs (SURVEY.md §5.2-5.3 golden +
  * property tests over the non-SQL surface).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = {
    // keep the session alive across suites; sbt's forked JVM exits at the end
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config(graft.sources.Tables.nanosAsLongKey, "true")
    .config("spark.ui.enabled", "false")
    // Spark 4.1's checksummed checkpoint writer stalls concurrent state
    // commits in local mode (flatMapGroupsWithState tasks park forever in
    // ChecksumCancellableFSDataOutputStream.close); checksums add nothing
    // on a local FS, so disable for tests.
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    // static conf: saveAsTable targets (bucketing tests) land under target/
    // so repeated runs overwrite instead of accreting /tmp dirs
    .config("spark.sql.warehouse.dir",
      new java.io.File("target/test-warehouse").getAbsolutePath)
    .getOrCreate()
}
