package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.{Failure, Success, Try}

/** Avro master-dataset adapter (SURVEY.md §2.A1): the reference's canonical
  * source is `spark.read.format("avro").load(paths: _*)` over per-provider
  * enrichment snapshots (ParquetDump.scala:116, SchemaRepair.scala:31).
  *
  * The `spark-avro` module is a separately-shipped optional jar and is NOT
  * in this environment's /opt/spark/jars, so locally Parquet is the
  * canonical columnar source (Tables) and this adapter either works (when
  * the jar is on the cluster classpath, as on EMR) or fails with a clear
  * actionable message rather than a bare ClassNotFoundException.
  *
  * Resolution attempt (round 4): a test-scoped
  * `"org.apache.spark" %% "spark-avro" % "4.1.2" % Test` dependency does
  * NOT resolve here — the offline dependency cache carries only scalatest/
  * scalacheck, and the connector jar is absent from every local cache
  * (`find / -name "*spark-avro*"` → nothing; only core avro-1.12.1 ships
  * with Spark). The real read/write path therefore stays exercised only on
  * clusters that bundle the module; the failure contract below is what CI
  * covers (SourceSpec).
  */
object AvroSource {

  /** Multi-path Avro scan, schemas merged by the reader (A1). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    Try(spark.read.format("avro").load(paths: _*)) match {
      case Success(df) => df
      case Failure(e) if isMissingModule(e) =>
        throw new IllegalStateException(
          "spark-avro is not on the classpath. Add the spark-avro module " +
            "matching your Spark version (bundled on EMR; " +
            "--packages org.apache.spark:spark-avro_2.13:<spark-version> " +
            "elsewhere), or convert the dataset to Parquet.", e)
      case Failure(e) => throw e
    }

  /** Avro write for repaired datasets (H2, SchemaRepair.scala:33). */
  def write(df: DataFrame, out: String): Unit =
    Try(df.write.format("avro").save(out)) match {
      case Success(_) => ()
      case Failure(e) if isMissingModule(e) =>
        throw new IllegalStateException(
          "spark-avro is not on the classpath (see AvroSource.read).", e)
      case Failure(e) => throw e
    }

  def available(spark: SparkSession): Boolean =
    Try(spark.read.format("avro")).map { r =>
      // format lookup is lazy; force resolution with a schema-less load of
      // an empty path list — cheap and deterministic
      r.load(Seq.empty[String]: _*); true
    }.recover {
      case e if isMissingModule(e) => false
      case _ => true
    }.getOrElse(true)

  private def isMissingModule(e: Throwable): Boolean = {
    val msg = Option(e.getMessage).getOrElse("")
    msg.contains("Failed to find data source: avro") ||
      msg.contains("AVRO") && msg.contains("not found") ||
      e.isInstanceOf[ClassNotFoundException]
  }
}
