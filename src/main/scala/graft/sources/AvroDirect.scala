package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileStream, DataFileWriter, SeekableInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Direct Avro container-file source/sink over `org.apache.avro` (which
  * ships with Spark core), for environments where the optional
  * `spark-avro` connector jar is absent. Implements the subset the
  * reference needs — nested records, arrays, maps, [null, T] unions,
  * date/timestamp logical types — which covers the full DPLA-MAP shape
  * (reference `ParquetDump.scala:116`, `SchemaRepair.scala:31,33`).
  *
  * Scale shape:
  *  - READ parallelism is one task per `splitSize` byte range, with
  *    ranges aligned to Avro sync blocks at read time (the spark-avro
  *    split behavior behind reference `ParquetDump.scala:116`): each
  *    task seeks to the first sync marker at or after its range start
  *    and reads every block that STARTS inside its range, so a single
  *    multi-TB container file fans out across the cluster and no record
  *    is read twice — the standard Hadoop Avro split contract
  *    (`sync(start)` / `pastSync(end)`);
  *  - schema resolution is Avro-native: the FIRST file's schema is the
  *    reader schema, and every other file resolves against it (reordered
  *    fields and defaulted additions are fine — the A1 multi-path merge
  *    contract);
  *  - WRITE is one container file per partition, written executor-side
  *    through the broadcast Hadoop conf (the Sitemap F2/H6 pattern), so
  *    no driver bottleneck and no global sort. Run it with speculative
  *    execution off (direct write, no output committer) — same contract
  *    as every executor-side put in graft.sinks.
  */
object AvroDirect {

  // ---------------------------------------------------------------- read

  /** Multi-path Avro scan: every `*.avro` under each path (or the path
    * itself if it is a file), one task per ≤`splitSize` byte range with
    * sync-block alignment resolved at read time, first file's schema as
    * the reader schema.
    */
  def read(spark: SparkSession, paths: Seq[String],
      splitSize: Long = DefaultSplitSize): DataFrame = {
    require(paths.nonEmpty, "at least one path required")
    require(splitSize > 0, s"splitSize must be positive, got $splitSize")
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val files = listAvroFiles(hconf.value, paths)
    require(files.nonEmpty,
      s"no .avro files under ${paths.mkString(", ")}")
    val readerSchema = fileSchema(hconf.value, files.head._1)
    val schemaJson = readerSchema.toString
    val structType = toCatalyst(readerSchema) match {
      case st: StructType => st
      case other => throw new UnsupportedOperationException(
        s"top-level Avro type must be a record, got $other")
    }
    // Byte-range splits computed from the listing's lengths (no extra
    // filesystem round-trips); block alignment happens in-task: each
    // reader syncs FORWARD to the first block at or after `start` and
    // stops once it passes `end`, so a block is owned by exactly the
    // split its first byte falls into — records never duplicate or drop
    // across split boundaries, whatever the block/split size ratio.
    val splits: Seq[(String, Long, Long)] = files.flatMap { case (f, len) =>
      if (len == 0) Seq((f, 0L, 0L))
      else (0L until len by splitSize).map(s => (f, s, math.min(s + splitSize, len)))
    }
    val rows = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { case (file, start, end) =>
        val expected = new Schema.Parser().parse(schemaJson)
        val reader = new DataFileReader[GenericRecord](
          openSeekable(hconf.value, file),
          new GenericDatumReader[GenericRecord](null, expected))
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        reader.sync(start)
        val convert = avroToRow(expected, structType)
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext && !reader.pastSync(end)
            if (!h) reader.close()
            h
          }
          def next(): Row = convert(reader.next()).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rows, structType)
  }

  /** Default split grain, matching Spark's files.maxPartitionBytes. */
  val DefaultSplitSize: Long = 128L * 1024 * 1024

  /** Seekable Hadoop input for [[DataFileReader]] (the split reader needs
    * seek/tell; avro-mapred's FsInput is not on the core classpath).
    */
  private def openSeekable(conf: Configuration, file: String): SeekableInput = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    new SeekableInput {
      def read(b: Array[Byte], off: Int, n: Int): Int = in.read(b, off, n)
      def seek(p: Long): Unit = in.seek(p)
      def tell(): Long = in.getPos
      def length(): Long = len
      def close(): Unit = in.close()
    }
  }

  /** Driver-side schema peek (also used by SchemaDdl-style divergence
    * checks): the writer schema of one container file.
    */
  def fileSchema(conf: Configuration, file: String): Schema = {
    val fs = new Path(file).getFileSystem(conf)
    val in = fs.open(new Path(file))
    try {
      val stream = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try stream.getSchema
      finally stream.close()
    } finally in.close()
  }

  /** Recursive listing (spark-avro's file index recurses too — a
    * partitioned/nested layout must not silently read a subset here);
    * hidden and metadata entries (`_SUCCESS`, `.crc`) are skipped.
    */
  private def listAvroFiles(
      conf: Configuration, paths: Seq[String]): Seq[(String, Long)] = {
    def walk(p: Path, fs: org.apache.hadoop.fs.FileSystem): Seq[(String, Long)] = {
      val status = fs.getFileStatus(p)
      if (status.isFile) {
        if (p.getName.endsWith(".avro")) Seq((p.toString, status.getLen))
        else Seq.empty
      } else fs.listStatus(p)
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .toSeq.flatMap(s =>
          if (s.isFile) {
            if (s.getPath.getName.endsWith(".avro"))
              Seq((s.getPath.toString, s.getLen))
            else Seq.empty
          } else walk(s.getPath, fs))
    }
    paths.flatMap { p =>
      val path = new Path(p)
      walk(path, path.getFileSystem(conf)).sortBy(_._1)
    }
  }

  // --------------------------------------------------------------- write

  /** Write `df` under `out` as one Avro container file per partition
    * (overwrite semantics). Empty partitions are skipped except partition
    * 0, so an empty frame still materializes its schema.
    */
  def write(df: DataFrame, out: String): Unit = {
    val spark = df.sparkSession
    val avroSchema = toAvro(df.schema, "topLevelRecord")
    val schemaJson = avroSchema.toString
    val structType = df.schema
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(hconf.value)
    if (fs.exists(outPath)) fs.delete(outPath, true)
    fs.mkdirs(outPath)
    val base = outPath.toString
    df.rdd.foreachPartition { iter =>
      val idx = TaskContext.getPartitionId()
      if (iter.nonEmpty || idx == 0) {
        val schema = new Schema.Parser().parse(schemaJson)
        val convert = rowToAvro(structType, schema)
        val file = new Path(f"$base/part-$idx%05d.avro")
        val os = file.getFileSystem(hconf.value).create(file, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(CodecFactory.snappyCodec())
        writer.create(schema, os)
        try iter.foreach(r =>
          writer.append(convert(r).asInstanceOf[GenericRecord]))
        finally writer.close()
      }
    }
    // an empty relation can plan to a ZERO-partition RDD (PropagateEmpty
    // Relation / spark.emptyDataFrame) — foreachPartition never runs, so
    // materialize the schema-only file driver-side to keep the contract
    // that the written dir is always readable
    if (!fs.listStatus(outPath).exists(_.getPath.getName.endsWith(".avro"))) {
      val schema = new Schema.Parser().parse(schemaJson)
      val os = fs.create(new Path(s"$base/part-00000.avro"), true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(CodecFactory.snappyCodec())
      writer.create(schema, os)
      writer.close()
    }
  }

  // ------------------------------------------------- schema conversion

  /** Unwrap a [null, T] union → (T, nullable). Avro unions beyond that
    * shape have no Catalyst analogue and fail fast.
    */
  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"only [null, T] unions are supported, got $s")
      (branches.head, branches.size < s.getTypes.size)
    } else (s, false)

  def toCatalyst(s: Schema): DataType = {
    val (base, _) = unwrap(s)
    base.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (logicalName(base) == "date") DateType else IntegerType
      case Schema.Type.LONG =>
        logicalName(base) match {
          case "timestamp-micros" | "timestamp-millis" => TimestampType
          case _ => LongType
        }
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
      case Schema.Type.RECORD =>
        StructType(base.getFields.asScala.map { f =>
          StructField(f.name, toCatalyst(f.schema), unwrap(f.schema)._2)
        }.toArray)
      case Schema.Type.ARRAY =>
        val (elem, elemNullable) = unwrap(base.getElementType)
        ArrayType(toCatalyst(elem), elemNullable)
      case Schema.Type.MAP =>
        val (v, vNullable) = unwrap(base.getValueType)
        MapType(StringType, toCatalyst(v), vNullable)
      case other =>
        throw new UnsupportedOperationException(s"Avro type $other")
    }
  }

  private def logicalName(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  /** Catalyst → Avro; nullable fields become [null, T] unions with null
    * defaults. Nested record names derive from the field path (Avro
    * record names must be unique per full name).
    */
  def toAvro(dt: DataType, path: String, nullable: Boolean = false): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case ArrayType(et, cn) =>
        Schema.createArray(toAvro(et, s"${path}_item", cn))
      case MapType(StringType, vt, cn) =>
        Schema.createMap(toAvro(vt, s"${path}_value", cn))
      case st: StructType =>
        val rec = Schema.createRecord(sanitize(path), null, "graft.avro", false)
        rec.setFields(st.fields.map { f =>
          val fieldSchema = toAvro(f.dataType, s"${path}_${f.name}", f.nullable)
          if (f.nullable)
            new Schema.Field(f.name, fieldSchema, null,
              Schema.Field.NULL_DEFAULT_VALUE)
          else new Schema.Field(f.name, fieldSchema)
        }.toSeq.asJava)
        rec
      case other =>
        throw new UnsupportedOperationException(
          s"no Avro mapping for Catalyst type $other at $path")
    }
    if (nullable)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  private def sanitize(path: String): String =
    path.replaceAll("[^A-Za-z0-9_]", "_")

  // -------------------------------------------------- value conversion

  /** Converter Avro runtime value → Catalyst external value, built once
    * per task from the (avro, catalyst) schema pair — the Avro side is
    * needed to distinguish micros/millis timestamps, which the Catalyst
    * type alone cannot.
    */
  private def avroToRow(s: Schema, dt: DataType): Any => Any = {
    val (base, _) = unwrap(s)
    (base.getType, dt) match {
      case (Schema.Type.RECORD, st: StructType) =>
        val converters = st.fields.map { f =>
          val avroField = base.getField(f.name)
          (f.name, avroToRow(avroField.schema, f.dataType))
        }
        v =>
          if (v == null) null
          else {
            val rec = v.asInstanceOf[GenericRecord]
            Row.fromSeq(converters.toSeq.map {
              case (name, c) => c(rec.get(name))
            })
          }
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val c = avroToRow(base.getElementType, et)
        v =>
          if (v == null) null
          else v.asInstanceOf[java.util.Collection[_]].asScala.map(c).toSeq
      case (Schema.Type.MAP, MapType(_, vt, _)) =>
        val c = avroToRow(base.getValueType, vt)
        v =>
          if (v == null) null
          else v.asInstanceOf[java.util.Map[_, _]].asScala.map {
            case (k, x) => k.toString -> c(x)
          }.toMap
      case (Schema.Type.LONG, TimestampType) =>
        val millis = logicalName(base) == "timestamp-millis"
        v =>
          if (v == null) null
          else {
            val micros =
              if (millis) v.asInstanceOf[Long] * 1000L
              else v.asInstanceOf[Long]
            val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
            ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
            ts
          }
      case (Schema.Type.INT, DateType) =>
        v =>
          if (v == null) null
          else java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case (_, StringType) =>
        v => if (v == null) null else v.toString
      case (_, BinaryType) =>
        {
          case null => null
          case b: ByteBuffer =>
            val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case f: GenericData.Fixed => f.bytes().clone()
          case other => other
        }
      case _ => identity[Any]
    }
  }

  /** Converter Catalyst external value (Row tree) → Avro runtime value.
    * Timestamps are written as micros (matching [[toAvro]]).
    */
  private def rowToAvro(dt: DataType, s: Schema): Any => Any = {
    val (base, _) = unwrap(s)
    dt match {
      case st: StructType =>
        val converters = st.fields.zipWithIndex.map { case (f, i) =>
          (i, f.name, rowToAvro(f.dataType, base.getField(f.name).schema))
        }
        v =>
          if (v == null) null
          else {
            val row = v.asInstanceOf[Row]
            val rec = new GenericData.Record(base)
            converters.foreach { case (i, name, c) =>
              rec.put(name, c(row.get(i)))
            }
            rec
          }
      case ArrayType(et, _) =>
        val c = rowToAvro(et, base.getElementType)
        v =>
          if (v == null) null
          else {
            val out = new java.util.ArrayList[Any]()
            v.asInstanceOf[scala.collection.Seq[_]].foreach(x => out.add(c(x)))
            out
          }
      case MapType(StringType, vt, _) =>
        val c = rowToAvro(vt, base.getValueType)
        v =>
          if (v == null) null
          else {
            val out = new java.util.HashMap[String, Any]()
            v.asInstanceOf[scala.collection.Map[_, _]].foreach {
              case (k, x) => out.put(k.toString, c(x))
            }
            out
          }
      case TimestampType =>
        v =>
          if (v == null) null
          else {
            val ts = v.asInstanceOf[java.sql.Timestamp]
            Math.addExact(
              Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L),
              (ts.getNanos / 1000).toLong)
          }
      case DateType =>
        v =>
          if (v == null) null
          else v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case BinaryType =>
        v => if (v == null) null else ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ByteType | ShortType =>
        // toAvro maps these to Avro INT, and Avro's union resolution is
        // `instanceof Integer` — a raw java.lang.Byte/Short in a
        // [null,int] union throws UnresolvedUnionException on every
        // non-null row (review finding); widen at write time
        v =>
          if (v == null) null
          else Integer.valueOf(v.asInstanceOf[Number].intValue())
      case _ => identity[Any]
    }
  }
}
