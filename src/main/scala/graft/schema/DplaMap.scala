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

  /** edmWebResource (SchemaRepair.scala:55-62). `edmRights` stays a plain
    * string in the repaired master — SchemaRepair passes it through unwrapped
    * (SchemaRepair.scala:60) and the hand-patch comment's cast spells
    * `edmRights:string` (SchemaRepair.scala:19).
    */
  val edmWebResource: StructType = StructType(Seq(
    StructField("uri", valueWrapper),
    StructField("fileFormat", ArrayType(StringType)),
    StructField("dcRights", ArrayType(StringType)),
    StructField("edmRights", StringType),
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

  /** date/temporal range struct (SchemaRepair.scala:97,112 passthrough). */
  val dateRange: StructType = StructType(Seq(
    StructField("originalSourceDate", StringType),
    StructField("begin", StringType),
    StructField("end", StringType)))

  /** sourceResource — the descriptive core (SchemaRepair.scala:92-115). */
  val sourceResource: StructType = StructType(Seq(
    StructField("alternateTitle", ArrayType(StringType)),
    StructField("collection", ArrayType(dcmiTypeCollection)),
    StructField("contributor", ArrayType(edmAgent)),
    StructField("creator", ArrayType(edmAgent)),
    StructField("date", ArrayType(dateRange)),
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
    StructField("temporal", ArrayType(dateRange)),
    StructField("title", ArrayType(StringType)),
    StructField("type", ArrayType(StringType))))

  /** Canonical top-level record, in SchemaRepair.fixSchema's select order
    * (SchemaRepair.scala:90-137). The opaque payload passthroughs
    * (`originalRecord`, `sidecar`, `messages`, SchemaRepair.scala:117,
    * :125-126) carry no reference-defined schema — the export drops them
    * unseen (ParquetDump.scala:15,19-20) — so they are omitted here and
    * documented as a non-goal (SURVEY.md §7.5).
    */
  val record: StructType = StructType(Seq(
    StructField("dplaUri", valueWrapper),
    StructField("sourceResource", sourceResource),
    StructField("dataProvider", edmAgent),
    StructField("hasView", ArrayType(edmWebResource)),
    StructField("intermediateProvider", edmAgent),
    StructField("isShownAt", edmWebResource),
    StructField("object", edmWebResource),
    StructField("preview", edmWebResource),
    StructField("provider", edmAgent),
    StructField("edmRights", valueWrapper),
    StructField("originalId", StringType),
    StructField("tags", ArrayType(valueWrapper)),
    StructField("iiifManifest", valueWrapper),
    StructField("mediaMaster", ArrayType(edmWebResource))))

  // ---------------------------------------------------------------------
  // Export shapes — what ParquetDump.modifyColumns emits over the canonical
  // master (ParquetDump.scala:10-113): value-wrappers unwrapped to plain
  // strings, webResource fields renamed fileFormat→format / dcRights→rights,
  // and sourceResource rebuilt with `genre` omitted.
  // ---------------------------------------------------------------------

  /** Flattened edmWebResource (ParquetDump.scala:106-113). `edmRights` is a
    * passthrough of the master's plain string (ParquetDump.scala:111).
    */
  val exportWebResource: StructType = StructType(Seq(
    StructField("uri", StringType),
    StructField("format", ArrayType(StringType)),
    StructField("rights", ArrayType(StringType)),
    StructField("edmRights", StringType),
    StructField("isReferencedBy", StringType)))

  /** Flattened edmAgent (ParquetDump.scala:89-104). */
  val exportAgent: StructType = StructType(Seq(
    StructField("uri", StringType),
    StructField("name", StringType),
    StructField("providedLabel", StringType),
    StructField("note", StringType),
    StructField("scheme", StringType),
    StructField("exactMatch", ArrayType(StringType)),
    StructField("closeMatch", ArrayType(StringType))))

  /** Flattened skosConcept (ParquetDump.scala:79-87). */
  val exportConcept: StructType = StructType(Seq(
    StructField("concept", StringType),
    StructField("providedLabel", StringType),
    StructField("note", StringType),
    StructField("scheme", StringType),
    StructField("exactMatch", ArrayType(StringType)),
    StructField("closeMatch", ArrayType(StringType))))

  /** Flattened dplaPlace (ParquetDump.scala:60-70). */
  val exportPlace: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("city", StringType),
    StructField("county", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("region", StringType),
    StructField("coordinates", StringType),
    StructField("exactMatch", ArrayType(StringType))))

  /** Flattened dcmiTypeCollection (ParquetDump.scala:72-77). */
  val exportCollection: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("isShownAt", exportWebResource)))

  /** Rebuilt sourceResource (ParquetDump.scala:30-52): same field order as
    * the master minus `genre`, with entity arrays flattened and `relation`
    * unwrapped to array<string>.
    */
  val exportSourceResource: StructType = StructType(Seq(
    StructField("alternateTitle", ArrayType(StringType)),
    StructField("collection", ArrayType(exportCollection)),
    StructField("contributor", ArrayType(exportAgent)),
    StructField("creator", ArrayType(exportAgent)),
    StructField("date", ArrayType(dateRange)),
    StructField("description", ArrayType(StringType)),
    StructField("extent", ArrayType(StringType)),
    StructField("format", ArrayType(StringType)),
    StructField("identifier", ArrayType(StringType)),
    StructField("language", ArrayType(exportConcept)),
    StructField("place", ArrayType(exportPlace)),
    StructField("publisher", ArrayType(exportAgent)),
    StructField("relation", ArrayType(StringType)),
    StructField("replacedBy", ArrayType(StringType)),
    StructField("replaces", ArrayType(StringType)),
    StructField("rights", ArrayType(StringType)),
    StructField("rightsHolder", ArrayType(exportAgent)),
    StructField("subject", ArrayType(exportConcept)),
    StructField("temporal", ArrayType(dateRange)),
    StructField("title", ArrayType(StringType)),
    StructField("type", ArrayType(StringType))))

  /** The full export record, in the column order modifyColumns produces:
    * in-place `withColumn` replacements keep the master positions
    * (sourceResource … mediaMaster), dropped columns (`dplaUri`,
    * `originalRecord`, `edmRights`, `sidecar`, `messages`, `tags`) vanish,
    * and the appended derivations (`uri`, `id`, `rights`,
    * ParquetDump.scala:12-17) land at the end.
    */
  val exportRecord: StructType = StructType(Seq(
    StructField("sourceResource", exportSourceResource),
    StructField("dataProvider", exportAgent),
    StructField("hasView", ArrayType(exportWebResource)),
    StructField("intermediateProvider", exportAgent),
    StructField("isShownAt", exportWebResource),
    StructField("object", exportWebResource),
    StructField("preview", exportWebResource),
    StructField("provider", exportAgent),
    StructField("originalId", StringType),
    StructField("iiifManifest", StringType),
    StructField("mediaMaster", ArrayType(exportWebResource)),
    StructField("uri", StringType),
    StructField("id", StringType),
    StructField("rights", StringType)))
}
