package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.schema.DplaMap
import graft.schema.SchemaAlign.unwrapValue

/** Export-flattening combinators — the reference's densest surface
  * (ParquetDump.modifyColumns and its combinator library,
  * /root/reference/.../ParquetDump.scala:10-113): rename/copy, drop, struct
  * unwrap/build, array-element restructuring via higher-order `transform`.
  *
  * These are parameterized `Column => Column` builders (the reference's own
  * `passthrough`/`deValue` pattern at ParquetDump.scala:54-58), so the whole
  * flatten compiles to one Catalyst Project collapsed over the scan — a
  * narrow, shuffle-free, codegen'd stage regardless of corpus size.
  *
  * Deviation from the reference (documented): a NULL entity struct stays
  * NULL here instead of becoming a struct of all-null fields — `struct(…)`
  * over a null parent is non-null in Spark, which would make `x IS NULL`
  * predicates silently false downstream. Every leaf value is identical.
  */
object Flatten {

  /** Copy a field as-is under a new name (ParquetDump.scala:54-56). */
  def passthrough(parent: Column, name: String): Column =
    parent.getField(name).as(name)

  /** Unwrap a struct<value:string> field to a plain string column
    * (ParquetDump.scala:57-58).
    */
  def deValue(parent: Column, name: String): Column =
    unwrapValue(parent.getField(name)).as(name)

  /** Unwrap an array of value-wrappers to array<string>
    * (ParquetDump.scala:85-86 idiom).
    */
  def deValueArray(parent: Column, name: String): Column =
    transform(parent.getField(name), unwrapValue(_)).as(name)

  /** Flatten an edmAgent struct: uri/scheme unwrapped, match lists to
    * array<string> (ParquetDump.scala:89-104).
    */
  def flattenAgent(agent: Column): Column =
    when(agent.isNull, lit(null).cast(DplaMap.exportAgent))
      .otherwise(struct(
        unwrapValue(agent.getField("uri")).as("uri"),
        passthrough(agent, "name"),
        passthrough(agent, "providedLabel"),
        passthrough(agent, "note"),
        unwrapValue(agent.getField("scheme")).as("scheme"),
        deValueArray(agent, "exactMatch"),
        deValueArray(agent, "closeMatch")))

  /** Flatten an edmWebResource struct (ParquetDump.scala:106-113):
    * uri/isReferencedBy unwrapped, fileFormat→format and dcRights→rights
    * renamed, edmRights passed through (a plain string in the master).
    */
  def flattenWebResource(wr: Column): Column =
    when(wr.isNull, lit(null).cast(DplaMap.exportWebResource))
      .otherwise(struct(
        unwrapValue(wr.getField("uri")).as("uri"),
        wr.getField("fileFormat").as("format"),
        wr.getField("dcRights").as("rights"),
        passthrough(wr, "edmRights"),
        unwrapValue(wr.getField("isReferencedBy")).as("isReferencedBy")))

  /** Flatten a skosConcept struct (ParquetDump.scala:79-87). */
  def flattenConcept(con: Column): Column =
    when(con.isNull, lit(null).cast(DplaMap.exportConcept))
      .otherwise(struct(
        passthrough(con, "concept"),
        passthrough(con, "providedLabel"),
        passthrough(con, "note"),
        unwrapValue(con.getField("scheme")).as("scheme"),
        deValueArray(con, "exactMatch"),
        deValueArray(con, "closeMatch")))

  /** Flatten a dplaPlace struct (ParquetDump.scala:60-70): geo fields pass
    * through, exactMatch unwraps to array<string>.
    */
  def flattenPlace(place: Column): Column =
    when(place.isNull, lit(null).cast(DplaMap.exportPlace))
      .otherwise(struct(
        passthrough(place, "name"),
        passthrough(place, "city"),
        passthrough(place, "county"),
        passthrough(place, "state"),
        passthrough(place, "country"),
        passthrough(place, "region"),
        passthrough(place, "coordinates"),
        deValueArray(place, "exactMatch")))

  /** Flatten a dcmiTypeCollection struct (ParquetDump.scala:72-77): title
    * and description pass through, isShownAt flattens as a web resource.
    */
  def flattenCollection(coll: Column): Column =
    when(coll.isNull, lit(null).cast(DplaMap.exportCollection))
      .otherwise(struct(
        passthrough(coll, "title"),
        passthrough(coll, "description"),
        flattenWebResource(coll.getField("isShownAt")).as("isShownAt")))

  /** Rebuild the sourceResource struct for export (ParquetDump.scala:30-52):
    * the master's field order minus `genre` (deliberately omitted by the
    * reference), entity arrays flattened element-wise, `relation` unwrapped
    * to array<string>.
    */
  def flattenSourceResource(sr: Column): Column =
    when(sr.isNull, lit(null).cast(DplaMap.exportSourceResource))
      .otherwise(struct(
        passthrough(sr, "alternateTitle"),
        transform(sr.getField("collection"), flattenCollection(_)).as("collection"),
        transform(sr.getField("contributor"), flattenAgent(_)).as("contributor"),
        transform(sr.getField("creator"), flattenAgent(_)).as("creator"),
        passthrough(sr, "date"),
        passthrough(sr, "description"),
        passthrough(sr, "extent"),
        passthrough(sr, "format"),
        passthrough(sr, "identifier"),
        transform(sr.getField("language"), flattenConcept(_)).as("language"),
        transform(sr.getField("place"), flattenPlace(_)).as("place"),
        transform(sr.getField("publisher"), flattenAgent(_)).as("publisher"),
        deValueArray(sr, "relation"),
        passthrough(sr, "replacedBy"),
        passthrough(sr, "replaces"),
        passthrough(sr, "rights"),
        transform(sr.getField("rightsHolder"), flattenAgent(_)).as("rightsHolder"),
        transform(sr.getField("subject"), flattenConcept(_)).as("subject"),
        passthrough(sr, "temporal"),
        passthrough(sr, "title"),
        passthrough(sr, "type")))

  /** Extract the dp.la item id from a dplaUri value
    * (ParquetDump.scala:12-13).
    */
  def itemId(dplaUri: Column): Column =
    substring_index(unwrapValue(dplaUri), "http://dp.la/api/items/", -1)
}
