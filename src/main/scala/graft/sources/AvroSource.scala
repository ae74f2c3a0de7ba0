package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.{Failure, Success, Try}

/** Avro master-dataset adapter (SURVEY.md §2.A1): the reference's canonical
  * source is `spark.read.format("avro").load(paths: _*)` over per-provider
  * enrichment snapshots (ParquetDump.scala:116, SchemaRepair.scala:31).
  *
  * The `spark-avro` module is a separately-shipped optional jar. When it
  * is on the classpath (as on EMR) its FileFormat is used — it splits
  * large container files on sync blocks and carries the full type matrix.
  * When it is absent (this environment's /opt/spark/jars carries only
  * core avro-1.12.1, and the offline resolver has no spark-avro artifact),
  * the read/write path falls back to [[AvroDirect]], a container-file
  * source/sink over `org.apache.avro` itself — so A1/H2 are exercised for
  * real either way, with the same nested-record coverage.
  */
object AvroSource {

  /** Multi-path Avro scan, schemas merged by the reader (A1). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    Try(spark.read.format("avro").load(paths: _*)) match {
      case Success(df) => df
      case Failure(e) if isMissingModule(e) => AvroDirect.read(spark, paths)
      case Failure(e) => throw e
    }

  /** Avro write for repaired datasets (H2, SchemaRepair.scala:33).
    * OVERWRITE semantics on both paths (the reference's idempotent-
    * overwrite posture, H7) — without the explicit mode the connector
    * path would error on an existing dir while the fallback deletes it,
    * and a caller tested against one would learn the wrong contract.
    */
  def write(df: DataFrame, out: String): Unit =
    Try(df.write.format("avro").mode("overwrite").save(out)) match {
      case Success(_) => ()
      case Failure(e) if isMissingModule(e) => AvroDirect.write(df, out)
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
