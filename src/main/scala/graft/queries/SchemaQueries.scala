package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Flatten
import graft.schema.SchemaAlign
import graft.sources.Tables

/** Schema-manipulation queries: the value-wrapper round trip (SURVEY §2.B8 ⇄
  * B3) and alignToSchema (B9) driven through flat-output shapes the DuckDB
  * oracle can express. The deep nested golden tests live in ScalaTest
  * (SURVEY §5.2) — these queries prove the same operators inside the
  * hash-compared pipeline.
  */
object SchemaQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Wrap scalars into a nested record (master-dataset direction), then
    // flatten back with the export combinators — identity end to end.
    "q_wrap_roundtrip" -> ((s, dir) => {
      val wrapped = t(s, dir, "documents").select(
        col("doc_id"),
        struct(
          SchemaAlign.wrapValue(col("text")).as("text"),
          SchemaAlign.wrapValue(col("source")).as("source")).as("rec"))
      wrapped.select(
        col("doc_id"),
        Flatten.deValue(col("rec"), "text"),
        Flatten.deValue(col("rec"), "source"))
    }),

    // Align a narrowed frame to a wider target: missing columns come back
    // as typed nulls (SchemaRepair's hand-patched missing-column idiom,
    // SchemaRepair.scala:12-24, generalized).
    "q_align_missing" -> ((s, dir) => {
      val target = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType)))
      SchemaAlign.alignToSchema(
        t(s, dir, "documents").select(col("doc_id"), col("text")), target)
    }),

    // Align coerces the value-wrapper in both directions: wrapped input,
    // flat target.
    "q_align_unwrap" -> ((s, dir) => {
      val wrapped = t(s, dir, "documents").select(
        col("doc_id"),
        SchemaAlign.wrapValue(col("text")).as("text"),
        SchemaAlign.wrapValue(col("lang")).as("lang"))
      val target = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType)))
      SchemaAlign.alignToSchema(wrapped, target)
    }),

    // In-place struct surgery via Column.withField (Catalyst UpdateFields —
    // the reference's `place.withField("exactMatch", …)` idiom,
    // SchemaRepair.scala:85 / SURVEY §2.B6).
    "q_with_field" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          struct(col("text").as("value")).as("rec"))
        .withColumn("rec",
          col("rec").withField("up", upper(col("rec").getField("value"))))
        .select(col("doc_id"), col("rec").getField("up").as("up"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_with_field" ->
      "SELECT doc_id, upper(text) AS up FROM documents",
    "q_wrap_roundtrip" ->
      "SELECT doc_id, text, source FROM documents",
    "q_align_missing" ->
      """SELECT doc_id, text, CAST(NULL AS VARCHAR) AS lang,
           CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n_chars
         FROM documents""",
    "q_align_unwrap" ->
      "SELECT doc_id, text, lang FROM documents",
  )
}
