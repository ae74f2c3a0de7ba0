package graft.schema

import org.apache.spark.sql.types._

/** The canonical DPLA-MAP record shape as StructType constants.
  *
  * The reference defines this schema operationally: SchemaRepair.fixSchema
  * produces it (/root/reference/.../SchemaRepair.scala:88-138) and
  * ParquetDump.modifyColumns consumes it (.../ParquetDump.scala:10-52).
  * Entity sub-schemas follow SURVEY.md §1.2's table. The signature idiom is
  * the value-wrapper: scalar URIs live as struct<value:string> in the master
  * dataset and are unwrapped to plain strings on export.
  */
object DplaMap {

  /** struct<value:string> — the value-wrapper (SchemaRepair.scala:37-38). */
  val valueWrapper: StructType =
    StructType(Seq(StructField("value", StringType)))

  /** edmAgent (SchemaRepair.scala:40-50). */
  val edmAgent: StructType = StructType(Seq(
    StructField("uri", valueWrapper),
    StructField("name", StringType),
    StructField("providedLabel", StringType),
    StructField("note", StringType),
    StructField("scheme", valueWrapper),
    StructField("exactMatch", ArrayType(valueWrapper)),
    StructField("closeMatch", ArrayType(valueWrapper))))

  /** edmWebResource (SchemaRepair.scala:55-62). */
  val edmWebResource: StructType = StructType(Seq(
    StructField("uri", valueWrapper),
    StructField("fileFormat", ArrayType(StringType)),
    StructField("dcRights", ArrayType(StringType)),
    StructField("edmRights", valueWrapper),
    StructField("isReferencedBy", valueWrapper)))

  /** skosConcept (SchemaRepair.scala:73-81). */
  val skosConcept: StructType = StructType(Seq(
    StructField("concept", StringType),
    StructField("providedLabel", StringType),
    StructField("note", StringType),
    StructField("scheme", valueWrapper),
    StructField("exactMatch", ArrayType(valueWrapper)),
    StructField("closeMatch", ArrayType(valueWrapper))))

  /** dplaPlace (SchemaRepair.scala:83-86). */
  val dplaPlace: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("city", StringType),
    StructField("county", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("region", StringType),
    StructField("coordinates", StringType),
    StructField("exactMatch", ArrayType(valueWrapper))))

  /** dcmiTypeCollection (SchemaRepair.scala:64-71). */
  val dcmiTypeCollection: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("isShownAt", edmWebResource)))

  /** sourceResource — the descriptive core (SchemaRepair.scala:92-115). */
  val sourceResource: StructType = StructType(Seq(
    StructField("alternateTitle", ArrayType(StringType)),
    StructField("collection", ArrayType(dcmiTypeCollection)),
    StructField("contributor", ArrayType(edmAgent)),
    StructField("creator", ArrayType(edmAgent)),
    StructField("date", ArrayType(StructType(Seq(
      StructField("originalSourceDate", StringType),
      StructField("begin", StringType),
      StructField("end", StringType))))),
    StructField("description", ArrayType(StringType)),
    StructField("extent", ArrayType(StringType)),
    StructField("format", ArrayType(StringType)),
    StructField("genre", ArrayType(skosConcept)),
    StructField("identifier", ArrayType(StringType)),
    StructField("language", ArrayType(skosConcept)),
    StructField("place", ArrayType(dplaPlace)),
    StructField("publisher", ArrayType(edmAgent)),
    StructField("relation", ArrayType(valueWrapper)),
    StructField("replacedBy", ArrayType(StringType)),
    StructField("replaces", ArrayType(StringType)),
    StructField("rights", ArrayType(StringType)),
    StructField("rightsHolder", ArrayType(edmAgent)),
    StructField("subject", ArrayType(skosConcept)),
    StructField("temporal", ArrayType(StructType(Seq(
      StructField("originalSourceDate", StringType),
      StructField("begin", StringType),
      StructField("end", StringType))))),
    StructField("title", ArrayType(StringType)),
    StructField("type", ArrayType(StringType))))

  /** Canonical top-level record (SchemaRepair.scala:90-137). */
  val record: StructType = StructType(Seq(
    StructField("dplaUri", valueWrapper),
    StructField("sourceResource", sourceResource),
    StructField("dataProvider", edmAgent),
    StructField("intermediateProvider", edmAgent),
    StructField("provider", edmAgent),
    StructField("isShownAt", edmWebResource),
    StructField("object", edmWebResource),
    StructField("preview", edmWebResource),
    StructField("hasView", ArrayType(edmWebResource)),
    StructField("mediaMaster", ArrayType(edmWebResource)),
    StructField("iiifManifest", valueWrapper),
    StructField("edmRights", valueWrapper),
    StructField("originalId", StringType),
    StructField("tags", ArrayType(StringType))))
}
