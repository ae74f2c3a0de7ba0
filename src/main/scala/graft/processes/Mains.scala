package graft.processes

import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.MqDpla
import graft.sinks.{JsonlDump, Manifest, Sitemap}
import graft.sources.{AvroSource, Catalog}

/** spark-submit entry points, one per reference driver program, each the
  * thin frame the reference uses (reference `MqReports.scala:164-171`:
  * read args → getOrCreate → execute → stop), wired to the plan-builder +
  * sink pairs in [[Processes]]. `MonthlyBatchMain` chains the four
  * monthly steps in the reference's EMR step order
  * (`monthly_batch_emr.sh:41-111`: parquet → jsonl → mq → sitemap).
  *
  * The frame stops the session only when it created it, so the same
  * mains run under spark-submit (fresh session, stopped at exit) and
  * embedded in tests or notebooks (caller's session, left running).
  */
object Mains {

  private[processes] def run(appName: String)(body: SparkSession => Unit): Unit = {
    val preExisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder().appName(appName).getOrCreate()
    try body(spark)
    finally if (!preExisting) spark.stop()
  }

  private[processes] def nowUtc: LocalDateTime =
    LocalDateTime.now(ZoneOffset.UTC)

  private[processes] def isoTimestamp: String =
    nowUtc.atZone(ZoneOffset.UTC).format(DateTimeFormatter.ISO_INSTANT)

  /** `root/yyyy/MM/suffix`, this month (PathHelper.datePath convention). */
  def datePath(root: String, suffix: String): String = {
    val now = nowUtc
    Catalog.datePath(root, now.getYear, now.getMonthValue, suffix)
  }
}

/** Master dataset (Avro snapshots) → flattened parquet export.
  * Args: masterRoot outRoot.
  */
object ParquetDumpMain {
  def main(args: Array[String]): Unit = {
    val Array(masterRoot, outRoot) = args.take(2)
    Mains.run("graft: parquet dump") { spark =>
      val hconf = spark.sparkContext.hadoopConfiguration
      val paths = Catalog.latestSnapshots(hconf, masterRoot, "enrichment")
        .values.toSeq.sorted
      require(paths.nonEmpty, s"no enrichment snapshots under $masterRoot")
      val records = AvroSource.read(spark, paths)
      val out = Mains.datePath(outRoot, "all.parquet")
      val count = Processes.parquetDump(
        Processes.schemaRepair(records), out)
      Manifest.write(hconf, out, Map("Count" -> count.toString),
        Mains.isoTimestamp)
      println(s"Parquet saved to $out")
    }
  }
}

/** Per-provider JSONL snapshots → gzipped provider + all dumps.
  * Args: masterRoot outRoot.
  */
object JsonlDumpMain {
  def main(args: Array[String]): Unit = {
    val Array(masterRoot, outRoot) = args.take(2)
    Mains.run("graft: jsonl dump") { spark =>
      val paths = Catalog.latestSnapshots(
        spark.sparkContext.hadoopConfiguration, masterRoot, "jsonl")
      val result = JsonlDump.dump(spark, paths,
        Mains.datePath(outRoot, "jsonl"), Mains.isoTimestamp)
      println(s"JSONL saved to ${result.outRoot} " +
        s"(${result.totalCount} records)")
    }
  }
}

/** Flattened parquet export → provider + contributor MQ score CSVs.
  * Args: parquetPath outRoot.
  */
object MqReportsMain {
  def main(args: Array[String]): Unit = {
    val Array(parquetPath, outRoot) = args.take(2)
    Mains.run("graft: mq reports") { spark =>
      val itemdata = MqDpla.itemdata(spark.read.parquet(parquetPath))
      val (np, nc) = Processes.mqReports(
        MqDpla.withDerived(itemdata), MqDpla.scoreCols,
        Mains.datePath(outRoot, "provider"),
        Mains.datePath(outRoot, "contributor"),
        Mains.isoTimestamp)
      println(s"MQ reports: $np provider rows, $nc contributor rows")
    }
  }
}

/** Flattened parquet export → sitemap subfiles + index.
  * Args: parquetPath outDir publicUrlPrefix [itemUrlBase].
  */
object SitemapMain {
  def main(args: Array[String]): Unit = {
    val Array(parquetPath, outDir, publicUrlPrefix) = args.take(3)
    val itemUrlBase =
      if (args.length > 3) args(3) else "https://dp.la/item/"
    Mains.run("graft: sitemap") { spark =>
      import spark.implicits._
      val ids = spark.read.parquet(parquetPath)
        .select(col("id")).as[String]
      val subfiles = Sitemap.write(spark, ids, outDir, itemUrlBase,
        publicUrlPrefix, Mains.isoTimestamp)
      println(s"Sitemap: ${subfiles.size} subfiles under $outDir")
    }
  }
}

/** Avro dataset → canonical-schema Avro dataset.
  * Args: inPath outPath.
  */
object SchemaRepairMain {
  def main(args: Array[String]): Unit = {
    val Array(inPath, outPath) = args.take(2)
    Mains.run("graft: schema repair") { spark =>
      val records = AvroSource.read(spark, Seq(inPath))
      AvroSource.write(Processes.schemaRepair(records), outPath)
      println(s"Repaired dataset saved to $outPath")
    }
  }
}

/** Per-provider schema DDL dump + divergence report.
  * Args: masterRoot outRoot.
  */
object SchemaTestMain {
  def main(args: Array[String]): Unit = {
    val Array(masterRoot, outRoot) = args.take(2)
    Mains.run("graft: schema test") { spark =>
      val frames = Catalog.latestSnapshots(
        spark.sparkContext.hadoopConfiguration, masterRoot, "enrichment")
        .map { case (provider, path) =>
          provider -> AvroSource.read(spark, Seq(path))
        }
      val divergent = Processes.schemaTest(spark, frames, outRoot)
      if (divergent.isEmpty) println("All provider schemas agree")
      else println(s"Divergent providers: ${divergent.mkString(", ")}")
    }
  }
}

/** Purge thumbnails for the ids in a parquet export.
  * Args: parquetPath thumbRoot.
  */
object ThumbnailPurgeMain {
  def main(args: Array[String]): Unit = {
    val Array(parquetPath, thumbRoot) = args.take(2)
    Mains.run("graft: thumbnail purge") { spark =>
      import spark.implicits._
      val ids = spark.read.parquet(parquetPath)
        .select(col("id")).as[String]
      val n = Processes.thumbnailPurge(ids, thumbRoot)
      println(s"Purged $n thumbnails under $thumbRoot")
    }
  }
}

/** The chained monthly batch, reference EMR step order
  * (`monthly_batch_emr.sh:41-111`): parquet → jsonl → mq → sitemap.
  * Args: masterRoot outRoot publicUrlPrefix.
  * Layout: outRoot/{parquet,jsonl,mq,sitemap}; parquet feeds mq+sitemap.
  */
object MonthlyBatchMain {
  def main(args: Array[String]): Unit = {
    val Array(masterRoot, outRoot, publicUrlPrefix) = args.take(3)
    val base = outRoot.stripSuffix("/")
    ParquetDumpMain.main(Array(masterRoot, s"$base/parquet"))
    JsonlDumpMain.main(Array(masterRoot, s"$base/jsonl"))
    val parquetOut = Mains.datePath(s"$base/parquet", "all.parquet")
    MqReportsMain.main(Array(parquetOut, s"$base/mq"))
    SitemapMain.main(Array(parquetOut, s"$base/sitemap", publicUrlPrefix))
  }
}
