package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal-column queries ([EXT]): binary payload metadata (oracled) and
  * the stubbed decode/feature pipeline (rows-only — the fake decode has no
  * SQL equivalent, but its plumbing must produce a full feature row per
  * media record).
  */
object MediaQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Opaque binary columns + typed metadata, fully in-plan.
    "q_multimodal_meta" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          col("text").cast("binary").as("content"))
        .select(col("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          sha2(col("content"), 256).as("sha"))
    }),

    // Rows-only: mapPartitions decode stub → typed feature batch.
    "q_media_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").withColumn("media_type",
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio").otherwise("video")),
        "doc_id", "text", "media_type", "source")
      Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("n_frames").cast("long").as("n_frames"),
          round(element_at(col("features"), 1), 4).as("feat0"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha
         FROM documents""",
  )
}
