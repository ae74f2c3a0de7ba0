package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing ([EXT], SURVEY.md §0.1): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature-extract
  * / frame-sample stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition behavior — is
  * real and tested; the actual media DECODE is STUBBED (this container ships
  * no image/audio codecs): `decodeStub` derives a deterministic fake feature
  * vector from the bytes. Swap `decodeStub`'s body for a real codec
  * (javacv / a JNI decoder) without touching any call site.
  *
  * Scale notes: per-record work runs in `mapPartitions` over a typed
  * Dataset, so decode amortizes any per-partition init (model load, codec
  * context) across the whole partition — the Scala analogue of the
  * batch-at-a-time Python `mapInPandas` pattern — and the binary payload
  * never shuffles: derive features first, shuffle only the small feature
  * rows.
  */
object Multimodal {

  /** A media record: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String,
      content: Array[Byte],
      meta_source: String)

  /** Extracted features (decode output batch shape). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      n_frames: Int,
      features: Array[Float])

  val FeatureDim = 8

  /** Build an opaque-binary media frame from any string column (the test
    * corpus carries no real media; utf-8 bytes stand in for the payload).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaTypeCol: String, sourceCol: String): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(mediaTypeCol).as("media_type"),
      col(payloadCol).cast("binary").as("content"),
      col(sourceCol).as("meta_source"))
      .as[MediaRecord]
  }

  /** STUB decode + feature extraction: a real implementation would open the
    * codec once per partition and decode each record; this one derives
    * deterministic pseudo-features from the byte content so the pipeline
    * shape (partition-amortized init, typed batch output, feature
    * dimensionality) is exercised end to end.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { iter =>
      // per-partition init would go here (codec/model load — stubbed)
      iter.map { m =>
        val bytes = if (m.content == null) Array.empty[Byte] else m.content
        val frames = frameOffsets(bytes.length, frameSize = 64)
        val feats = Array.tabulate(FeatureDim) { d =>
          // deterministic fake: byte-sum of every FeatureDim-th byte, scaled
          var acc = 0L
          var i = d
          while (i < bytes.length) { acc += (bytes(i) & 0xff); i += FeatureDim }
          (acc % 1000L) / 1000.0f
        }
        MediaFeatures(m.media_id, m.media_type, bytes.length.toLong,
          frames.length, feats)
      }
    }
  }

  /** Frame sampling plan for a byte stream: offsets of fixed-size frames
    * (a video decoder would seek keyframes; the boundary math is identical).
    */
  def frameOffsets(totalBytes: Int, frameSize: Int): Array[Int] = {
    require(frameSize > 0)
    if (totalBytes <= 0) Array.empty
    else Array.range(0, totalBytes, frameSize)
  }

  /** "Resize": truncate/pad the payload to a target byte budget — the
    * shuffle-free narrow transform a real thumbnailer would occupy.
    */
  def resizeStub(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.map { m =>
      val b = if (m.content == null) Array.empty[Byte] else m.content
      m.copy(content = java.util.Arrays.copyOf(b, math.min(b.length, targetBytes)))
    }
  }
}
