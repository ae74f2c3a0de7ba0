package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    when(agent.isNull, lit(null).cast(
      "struct<uri:string,name:string,providedLabel:string,note:string," +
        "scheme:string,exactMatch:array<string>,closeMatch:array<string>>"))
      .otherwise(struct(
        unwrapValue(agent.getField("uri")).as("uri"),
        agent.getField("name").as("name"),
        agent.getField("providedLabel").as("providedLabel"),
        agent.getField("note").as("note"),
        unwrapValue(agent.getField("scheme")).as("scheme"),
        transform(agent.getField("exactMatch"), unwrapValue(_)).as("exactMatch"),
        transform(agent.getField("closeMatch"), unwrapValue(_)).as("closeMatch")))

  /** Flatten an edmWebResource struct (ParquetDump.scala:106-113). */
  def flattenWebResource(wr: Column): Column =
    when(wr.isNull, lit(null).cast(
      "struct<uri:string,fileFormat:array<string>,dcRights:array<string>," +
        "edmRights:string,isReferencedBy:string>"))
      .otherwise(struct(
        unwrapValue(wr.getField("uri")).as("uri"),
        wr.getField("fileFormat").as("fileFormat"),
        wr.getField("dcRights").as("dcRights"),
        unwrapValue(wr.getField("edmRights")).as("edmRights"),
        unwrapValue(wr.getField("isReferencedBy")).as("isReferencedBy")))

  /** Extract the dp.la item id from a dplaUri value
    * (ParquetDump.scala:12-13).
    */
  def itemId(dplaUri: Column): Column =
    substring_index(unwrapValue(dplaUri), "http://dp.la/api/items/", -1)
}
