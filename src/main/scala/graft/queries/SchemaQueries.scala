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

    // The full repair → export chain (SchemaRepair.fixSchema then
    // ParquetDump.modifyColumns): DPLA-shaped records synthesized from
    // `documents`, aligned to the canonical master schema (value-wrappers
    // injected), then flattened with the export combinators — the oracle
    // reads the same leaves straight off the flat table, proving the
    // wrap → rebuild → unwrap chain is leaf-identity. The whole thing is
    // one collapsed Project over the scan (no shuffle at any scale).
    "q_flatten_export" -> ((s, dir) => {
      val raw = t(s, dir, "documents").select(
        concat(lit("http://dp.la/api/items/"),
          col("doc_id").cast(StringType)).as("dplaUri"),
        struct(
          array(col("text")).as("title"),
          array(struct(
            col("source").as("providedLabel"),
            struct(col("lang").as("value")).as("scheme"),
            array(struct(concat(lit("http://vocab/"),
              col("doc_id").cast(StringType)).as("value"))).as("exactMatch")
          )).as("subject"),
          array(struct(
            col("source").as("name"),
            col("lang").as("state"),
            array(struct(col("source").as("value"))).as("exactMatch")
          )).as("place"),
          array(struct(concat(col("source"), lit("-coll")).as("title"))).as("collection"),
          array(struct(col("lang").as("value"))).as("relation"),
          // populated so the flatten's deliberate genre OMISSION is live
          array(struct(lit("Sound").as("providedLabel"))).as("genre")
        ).as("sourceResource"),
        struct(
          col("source").as("name"),
          struct(concat(lit("http://provider/"), col("source")).as("value")).as("uri")
        ).as("provider"),
        col("lang").as("edmRights"),
        col("doc_id").cast(StringType).as("originalId"))
      val canonical =
        SchemaAlign.alignToSchema(raw, graft.schema.DplaMap.record)
      val flat = graft.processes.Processes.flattenRecord(canonical)
      flat.select(
        col("id"),
        col("uri"),
        col("originalId"),
        col("rights"),
        element_at(col("sourceResource.title"), 1).as("title"),
        element_at(col("sourceResource.subject"), 1)
          .getField("providedLabel").as("subject_label"),
        element_at(col("sourceResource.subject"), 1)
          .getField("scheme").as("subject_scheme"),
        element_at(element_at(col("sourceResource.subject"), 1)
          .getField("exactMatch"), 1).as("subject_match"),
        element_at(col("sourceResource.place"), 1)
          .getField("state").as("place_state"),
        element_at(element_at(col("sourceResource.place"), 1)
          .getField("exactMatch"), 1).as("place_match"),
        element_at(col("sourceResource.collection"), 1)
          .getField("title").as("collection_title"),
        element_at(col("sourceResource.relation"), 1).as("relation"),
        col("provider").getField("name").as("provider_name"),
        col("provider").getField("uri").as("provider_uri"))
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
    "q_flatten_export" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id,
           'http://dp.la/api/items/' || CAST(doc_id AS VARCHAR) AS uri,
           CAST(doc_id AS VARCHAR) AS originalId,
           lang AS rights,
           text AS title,
           source AS subject_label,
           lang AS subject_scheme,
           'http://vocab/' || CAST(doc_id AS VARCHAR) AS subject_match,
           lang AS place_state,
           source AS place_match,
           source || '-coll' AS collection_title,
           lang AS relation,
           source AS provider_name,
           'http://provider/' || source AS provider_uri
         FROM documents""",
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
