package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema alignment: rewrite any DataFrame to a target StructType, the
  * generalization of the reference's hand-written SchemaRepair.fixSchema
  * (/root/reference/.../SchemaRepair.scala:88-138, one 48-line select of 27
  * reshaped columns) and its hand-patched null/empty-array injections
  * (SchemaRepair.scala:12-24 comment, :61,:67-70).
  *
  * Plain Scala recursion emitting built-in expressions — `struct`,
  * `transform`, `lit(null).cast` — exactly as SURVEY.md §7.3 prescribes: no
  * custom Rule, no UDF, everything codegen-able and collapsible by Catalyst
  * into a single Project over the scan. Missing fields become typed nulls;
  * extra fields are dropped; matching fields recurse structurally; the
  * value-wrapper idiom is coerced in both directions (string ⇄
  * struct<value:string>).
  */
object SchemaAlign {

  /** Rewrite df to exactly `target` (column order included). */
  def alignToSchema(df: DataFrame, target: StructType): DataFrame = {
    val srcFields = df.schema.fields.map(f => f.name -> f).toMap
    val cols = target.fields.map { tf =>
      srcFields.get(tf.name) match {
        case Some(sf) => coerce(col(tf.name), sf.dataType, tf.dataType).as(tf.name)
        case None     => lit(null).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Wrap a scalar column into struct<value:string>
    * (SchemaRepair.scala:37-38 `toValueField`).
    */
  def wrapValue(c: Column): Column = struct(c.cast(StringType).as("value"))

  /** Unwrap struct<value:string> back to the scalar
    * (ParquetDump.scala:12 `.value`, :23 `.getItem("value")`).
    */
  def unwrapValue(c: Column): Column = c.getField("value")

  /** Structural coercion from `from` to `to`, null-propagating. */
  def coerce(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (f, t) if f == t => c

    // value-wrapper both directions
    case (_: StringType, t: StructType) if isValueWrapper(t) => wrapValue(c)
    case (f: StructType, _: StringType) if isValueWrapper(f) => unwrapValue(c)

    case (f: StructType, t: StructType) =>
      val fFields = f.fields.map(x => x.name -> x).toMap
      val parts = t.fields.map { tf =>
        fFields.get(tf.name) match {
          case Some(sf) =>
            coerce(c.getField(tf.name), sf.dataType, tf.dataType).as(tf.name)
          case None => lit(null).cast(tf.dataType).as(tf.name)
        }
      }
      // a null input struct must stay null, not become struct(null, null, …)
      when(c.isNull, lit(null).cast(t)).otherwise(struct(parts.toIndexedSeq: _*))

    case (ArrayType(fe, _), ArrayType(te, _)) =>
      transform(c, e => coerce(e, fe, te))

    case (_, t) => c.cast(t)
  }

  def isValueWrapper(t: StructType): Boolean =
    t.fields.length == 1 && t.fields.head.name == "value" &&
      t.fields.head.dataType == StringType
}
