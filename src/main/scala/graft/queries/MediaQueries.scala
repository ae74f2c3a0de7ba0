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

    // ORACLED decode: valid PNG/JPEG headers are synthesized in-plan
    // (unhex of signature + IHDR / APP0+SOF0 hex with dimensions derived
    // from fixture columns), then the real header parser in
    // Multimodal.imageDims reads the dimensions back inside the
    // mapPartitions decode — the DuckDB oracle predicts them straight from
    // doc_id/n_chars, so a parser that mis-walks a segment or flips
    // endianness hash-mismatches.
    "q_media_features" -> ((s, dir) => {
      val w = (col("doc_id") % 640 + 16).cast("int")
      val h = (col("n_chars") % 480 + 16).cast("int")
      val pngHex = concat(
        // signature + IHDR length(13) + "IHDR"
        lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
        lit("0802000000")) // bit depth 8, truecolor, deflate/0/0
      val jpgHex = concat(
        // SOI + APP0(JFIF, len 16) + SOF0(len 17): precision, h, w, 3 comps
        lit("FFD8" + "FFE00010" + "4A46494600010100000100010000" +
          "FFC00011" + "08"),
        lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
        lit("03011100021101031101"))
      val media = Multimodal.asMedia(
        t(s, dir, "documents")
          .withColumn("media_type", lit("image"))
          .withColumn("payload",
            unhex(when(col("doc_id") % 2 === 0, pngHex).otherwise(jpgHex))),
        "doc_id", "payload", "media_type", "source")
      Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("img_format"), col("width"),
          col("height"), col("n_bytes"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha
         FROM documents""",

    // PNG header = 8 sig + 8 len/type + 8 dims + 5 tail = 29 bytes;
    // JPEG = 2 SOI + 18 APP0 + 19 SOF0 = 39 bytes.
    "q_media_features" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS img_format,
           CAST((doc_id % 640) + 16 AS INTEGER) AS width,
           CAST((n_chars % 480) + 16 AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 29 ELSE 39 END AS BIGINT)
             AS n_bytes
         FROM documents""",
  )
}
