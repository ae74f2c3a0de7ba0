package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.{DplaMap, SchemaAlign}

/** Golden + property coverage for alignToSchema / wrap / unwrap on nested
  * DPLA-MAP fixtures (FIXTURES.md §2): degraded variants are exactly the
  * drift SchemaRepair exists to fix (missing columns, unwrapped scalars,
  * missing sub-fields).
  */
class SchemaAlignSpec extends SparkSpec {
  import SchemaAlign._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)

  test("missing top-level columns become typed nulls") {
    val degraded = df(
      StructType(Seq(StructField("originalId", StringType))),
      Row("abc"))
    val fixed = alignToSchema(degraded, DplaMap.record)
    assert(fixed.schema === DplaMap.record)
    val r = fixed.head()
    assert(r.getAs[Any]("iiifManifest") === null)
    assert(r.getAs[Any]("mediaMaster") === null)
    assert(r.getAs[String]("originalId") === "abc")
  }

  test("unwrapped scalar is wrapped to struct<value:string>") {
    val degraded = df(
      StructType(Seq(StructField("dplaUri", StringType))),
      Row("http://dp.la/api/items/xyz"))
    val fixed = alignToSchema(degraded, DplaMap.record)
    assert(fixed.select("dplaUri.value").head().getString(0)
      === "http://dp.la/api/items/xyz")
  }

  test("struct with missing sub-fields gains typed-null members, keeps values") {
    val partialAgent = StructType(Seq(
      StructField("name", StringType)))
    val degraded = df(
      StructType(Seq(StructField("provider", partialAgent))),
      Row(Row("Some Hub")))
    val fixed = alignToSchema(degraded, DplaMap.record)
    val r = fixed.select("provider.name", "provider.uri").head()
    assert(r.getString(0) === "Some Hub")
    assert(r.get(1) === null)
  }

  test("null input struct stays null (not struct of nulls)") {
    val degraded = df(
      StructType(Seq(StructField("provider", StructType(Seq(
        StructField("name", StringType)))))),
      Row(null))
    val fixed = alignToSchema(degraded, DplaMap.record)
    assert(fixed.select("provider").head().get(0) === null)
  }

  test("array elements are coerced per element") {
    val degraded = df(
      StructType(Seq(StructField("hasView", ArrayType(StructType(Seq(
        StructField("uri", StringType))))))),
      Row(Seq(Row("u1"), Row("u2"))))
    val fixed = alignToSchema(degraded, DplaMap.record)
    val uris = fixed
      .select(expr("transform(hasView, x -> x.uri.value)")).head().getSeq[String](0)
    assert(uris === Seq("u1", "u2"))
  }

  test("alignToSchema is idempotent on the canonical schema") {
    val degraded = df(
      StructType(Seq(StructField("originalId", StringType))),
      Row("abc"))
    val once = alignToSchema(degraded, DplaMap.record)
    val twice = alignToSchema(once, DplaMap.record)
    assert(twice.schema === once.schema)
    assert(twice.collect() === once.collect())
  }

  test("extra columns are dropped") {
    val degraded = df(
      StructType(Seq(
        StructField("originalId", StringType),
        StructField("bogus", StringType))),
      Row("abc", "x"))
    val fixed = alignToSchema(degraded, DplaMap.record)
    assert(!fixed.columns.contains("bogus"))
  }

  test("unwrap(wrap(x)) == x including nulls and empties") {
    val d = df(
      StructType(Seq(StructField("s", StringType))),
      Row("a"), Row(""), Row(null))
    val rt = d.select(unwrapValue(wrapValue(col("s"))).as("s"))
    assert(rt.collect().map(_.get(0)).toSeq === Seq("a", "", null))
  }

  // -------------------------------------------------------------------
  // Schema goldens vs the reference, hand-transcribed from
  // SchemaRepair.fixSchema (SchemaRepair.scala:88-138) and
  // ParquetDump.modifyColumns (ParquetDump.scala:10-113). DDL notation is
  // deliberately different from DplaMap's StructType constants so drift in
  // either representation fails the test.
  // -------------------------------------------------------------------

  private val wrDdl =
    "uri:struct<value:string>,fileFormat:array<string>,dcRights:array<string>," +
      "edmRights:string,isReferencedBy:struct<value:string>"
  private val agentDdl =
    "uri:struct<value:string>,name:string,providedLabel:string,note:string," +
      "scheme:struct<value:string>,exactMatch:array<struct<value:string>>," +
      "closeMatch:array<struct<value:string>>"
  private val conceptDdl =
    "concept:string,providedLabel:string,note:string," +
      "scheme:struct<value:string>,exactMatch:array<struct<value:string>>," +
      "closeMatch:array<struct<value:string>>"
  private val placeDdl =
    "name:string,city:string,county:string,state:string,country:string," +
      "region:string,coordinates:string,exactMatch:array<struct<value:string>>"
  private val dateDdl = "originalSourceDate:string,begin:string,end:string"

  /** Strip nullability (Spark marks computed leaves non-null) so goldens
    * compare names/types/order only.
    */
  private def relaxed(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, relaxed(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(relaxed(a.elementType), containsNull = true)
    case other => other
  }

  private val masterSrDdl =
    s"alternateTitle:array<string>," +
      s"collection:array<struct<title:string,description:string,isShownAt:struct<$wrDdl>>>," +
      s"contributor:array<struct<$agentDdl>>,creator:array<struct<$agentDdl>>," +
      s"date:array<struct<$dateDdl>>,description:array<string>," +
      s"extent:array<string>,format:array<string>," +
      s"genre:array<struct<$conceptDdl>>,identifier:array<string>," +
      s"language:array<struct<$conceptDdl>>,place:array<struct<$placeDdl>>," +
      s"publisher:array<struct<$agentDdl>>,relation:array<struct<value:string>>," +
      s"replacedBy:array<string>,replaces:array<string>,rights:array<string>," +
      s"rightsHolder:array<struct<$agentDdl>>,subject:array<struct<$conceptDdl>>," +
      s"temporal:array<struct<$dateDdl>>,title:array<string>,type:array<string>"

  test("canonical record schema is fixSchema's literal output, field for field") {
    // SchemaRepair.scala:19 spells the repaired webResource shape verbatim
    assert(DplaMap.edmWebResource === DataType.fromDDL(
      "struct<uri:struct<value:string>,fileFormat:array<string>," +
        "dcRights:array<string>,edmRights:string," +
        "isReferencedBy:struct<value:string>>"))
    val recordDdl =
      s"dplaUri struct<value:string>, sourceResource struct<$masterSrDdl>, " +
        s"dataProvider struct<$agentDdl>, hasView array<struct<$wrDdl>>, " +
        s"intermediateProvider struct<$agentDdl>, isShownAt struct<$wrDdl>, " +
        s"object struct<$wrDdl>, preview struct<$wrDdl>, " +
        s"provider struct<$agentDdl>, edmRights struct<value:string>, " +
        s"originalId string, tags array<struct<value:string>>, " +
        s"iiifManifest struct<value:string>, mediaMaster array<struct<$wrDdl>>"
    assert(DplaMap.record === StructType.fromDDL(recordDdl))
  }

  test("flattenRecord emits ParquetDump's export schema, genre omitted") {
    val exportWrDdl =
      "uri:string,format:array<string>,rights:array<string>," +
        "edmRights:string,isReferencedBy:string"
    val exportAgentDdl =
      "uri:string,name:string,providedLabel:string,note:string,scheme:string," +
        "exactMatch:array<string>,closeMatch:array<string>"
    val exportConceptDdl =
      "concept:string,providedLabel:string,note:string,scheme:string," +
        "exactMatch:array<string>,closeMatch:array<string>"
    val exportPlaceDdl =
      "name:string,city:string,county:string,state:string,country:string," +
        "region:string,coordinates:string,exactMatch:array<string>"
    val exportSrDdl =
      s"alternateTitle:array<string>," +
        s"collection:array<struct<title:string,description:string,isShownAt:struct<$exportWrDdl>>>," +
        s"contributor:array<struct<$exportAgentDdl>>," +
        s"creator:array<struct<$exportAgentDdl>>," +
        s"date:array<struct<$dateDdl>>,description:array<string>," +
        s"extent:array<string>,format:array<string>,identifier:array<string>," +
        s"language:array<struct<$exportConceptDdl>>," +
        s"place:array<struct<$exportPlaceDdl>>," +
        s"publisher:array<struct<$exportAgentDdl>>,relation:array<string>," +
        s"replacedBy:array<string>,replaces:array<string>,rights:array<string>," +
        s"rightsHolder:array<struct<$exportAgentDdl>>," +
        s"subject:array<struct<$exportConceptDdl>>," +
        s"temporal:array<struct<$dateDdl>>,title:array<string>,type:array<string>"
    val exportRecordDdl =
      s"sourceResource struct<$exportSrDdl>, dataProvider struct<$exportAgentDdl>, " +
        s"hasView array<struct<$exportWrDdl>>, " +
        s"intermediateProvider struct<$exportAgentDdl>, " +
        s"isShownAt struct<$exportWrDdl>, object struct<$exportWrDdl>, " +
        s"preview struct<$exportWrDdl>, provider struct<$exportAgentDdl>, " +
        s"originalId string, iiifManifest string, " +
        s"mediaMaster array<struct<$exportWrDdl>>, " +
        s"uri string, id string, rights string"

    val flat = graft.processes.Processes.flattenRecord(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], DplaMap.record))
    // schema() preserves per-field nullability Spark infers for computed
    // columns; compare structurally on names/types/order via DDL parse.
    assert(relaxed(flat.schema) === StructType.fromDDL(exportRecordDdl))
    assert(relaxed(flat.schema) === DplaMap.exportRecord)
    val sr = flat.schema("sourceResource").dataType.asInstanceOf[StructType]
    assert(!sr.fieldNames.contains("genre"))
    assert(sr.fieldNames.take(4).toSeq ===
      Seq("alternateTitle", "collection", "contributor", "creator"))
  }
}
