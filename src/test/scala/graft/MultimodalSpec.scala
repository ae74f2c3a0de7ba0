package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: schema/batch shape of the stubbed decode pipeline
  * (the decode itself is a deterministic fake — see Multimodal scaladoc).
  */
class MultimodalSpec extends SparkSpec {

  test("asMedia + decodeStub produce one full feature row per record") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world", "image", "srcA"),
      (2L, "", "audio", "srcB"),
      (3L, "a" * 200, "video", "srcC"))
      .toDF("doc_id", "text", "mt", "source")
    val media = Multimodal.asMedia(docs, "doc_id", "text", "mt", "source")
    val feats = Multimodal.decodeStub(media).collect().sortBy(_.media_id)

    assert(feats.length === 3)
    assert(feats.forall(_.features.length === Multimodal.FeatureDim))
    assert(feats(0).n_bytes === 11L)
    assert(feats(1).n_bytes === 0L)
    assert(feats(1).n_frames === 0)
    assert(feats(2).n_frames === math.ceil(200.0 / 64).toInt)
    assert(feats(2).media_type === "video")
  }

  test("decode is deterministic: same bytes, same features") {
    import spark.implicits._
    val docs = Seq((1L, "same payload", "image", "s"),
      (2L, "same payload", "image", "s")).toDF("doc_id", "text", "mt", "source")
    val f = Multimodal.decodeStub(
      Multimodal.asMedia(docs, "doc_id", "text", "mt", "source"))
      .collect().sortBy(_.media_id)
    assert(f(0).features.toSeq === f(1).features.toSeq)
  }

  test("frameOffsets boundary math") {
    assert(Multimodal.frameOffsets(0, 64).isEmpty)
    assert(Multimodal.frameOffsets(1, 64).toSeq === Seq(0))
    assert(Multimodal.frameOffsets(64, 64).toSeq === Seq(0))
    assert(Multimodal.frameOffsets(65, 64).toSeq === Seq(0, 64))
  }

  test("imageDims parses PNG and JPEG headers, rejects junk and truncation") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 640x480
    val png = hx("89504E470D0A1A0A" + "0000000D49484452" +
      "00000280" + "000001E0" + "0802000000")
    assert(Multimodal.imageDims(png) ===
      Some(Multimodal.ImageDims("png", 640, 480)))
    // JPEG 320x200 behind an APP0 the parser must walk over
    val jpg = hx("FFD8" + "FFE00010" + "4A46494600010100000100010000" +
      "FFC00011" + "08" + "00C8" + "0140" + "03011100021101031101")
    assert(Multimodal.imageDims(jpg) ===
      Some(Multimodal.ImageDims("jpeg", 320, 200)))
    // progressive JPEG (SOF2) parses too
    val jpg2 = hx("FFD8" + "FFC20011" + "08" + "0010" + "0020" +
      "03011100021101031101")
    assert(Multimodal.imageDims(jpg2) ===
      Some(Multimodal.ImageDims("jpeg", 32, 16)))
    assert(Multimodal.imageDims("not an image".getBytes) === None)
    assert(Multimodal.imageDims(png.take(20)) === None) // truncated IHDR
    assert(Multimodal.imageDims(hx("FFD8FFE000")) === None) // truncated APP0
    assert(Multimodal.imageDims(Array.empty[Byte]) === None)
    // a stray mid-stream SOI is a standalone marker (no length word):
    // the walk must step over it and still find the SOF, not read the
    // SOF's own 0xFFC0 bytes as a bogus segment length and skip past it
    val jpgStraySoi = hx("FFD8" + "FFD8" + "FFC00011" + "08" + "00C8" +
      "0140" + "03011100021101031101")
    assert(Multimodal.imageDims(jpgStraySoi) ===
      Some(Multimodal.ImageDims("jpeg", 320, 200)))
    // EOI before any SOF: image ended without a frame header -> None,
    // even when plausible-looking SOF bytes follow the EOI
    val jpgEoiFirst = hx("FFD8" + "FFD9" + "FFC00011" + "08" + "00C8" +
      "0140" + "03011100021101031101")
    assert(Multimodal.imageDims(jpgEoiFirst) === None)
  }

  test("decodeStub surfaces parsed dimensions and nulls for non-images") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val png = hx("89504E470D0A1A0A" + "0000000D49484452" +
      "00000280" + "000001E0" + "0802000000")
    val docs = Seq(
      (1L, png, "image", "s"),
      (2L, "plain text".getBytes, "audio", "s"))
      .toDF("doc_id", "payload", "mt", "source")
    val f = Multimodal.decodeStub(
      Multimodal.asMedia(docs, "doc_id", "payload", "mt", "source"))
      .collect().sortBy(_.media_id)
    assert(f(0).img_format === "png")
    assert(f(0).width === Some(640) && f(0).height === Some(480))
    assert(f(1).img_format === null)
    assert(f(1).width === None && f(1).height === None)
  }

  test("wavMeta parses canonical and chunk-reordered WAV, rejects junk") {
    import java.nio.{ByteBuffer, ByteOrder}
    def wav(channels: Int, rate: Int, bits: Int, data: Int,
        leadingChunk: Boolean = false): Array[Byte] = {
      val extra = if (leadingChunk) 12 else 0 // "LIST" chunk, 4-byte body
      val b = ByteBuffer.allocate(44 + extra).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra + data)
        .put("WAVE".getBytes("US-ASCII"))
      if (leadingChunk)
        b.put("LIST".getBytes("US-ASCII")).putInt(4)
          .put("INFO".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * bits / 8)
        .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
        .put("data".getBytes("US-ASCII")).putInt(data)
      b.array()
    }
    assert(Multimodal.wavMeta(wav(2, 44100, 16, 176400)) ===
      Some((2, 44100, 16, 176400L)))
    // an extra chunk before fmt is walked over, not mistaken for it
    assert(Multimodal.wavMeta(wav(1, 8000, 16, 4000, leadingChunk = true)) ===
      Some((1, 8000, 16, 4000L)))
    // junk, truncation, image bytes: all None, no exceptions
    assert(Multimodal.wavMeta("not audio at all".getBytes) === None)
    assert(Multimodal.wavMeta(wav(2, 44100, 16, 100).take(20)) === None)
    assert(Multimodal.wavMeta(Array[Byte]()) === None)
    // corrupt giant declared chunk sizes: must end the walk, not wrap an
    // Int increment negative and index out of bounds
    def junk(size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(32)
        .put("WAVE".getBytes("US-ASCII"))
        .put("JUNK".getBytes("US-ASCII")).putInt(size)
        .put(new Array[Byte](20))
      b.array()
    }
    assert(Multimodal.wavMeta(junk(Int.MaxValue - 8)) === None)
    // unsigned size past 2^31 (LE32 reads it as a positive Long)
    assert(Multimodal.wavMeta(junk(0xfffffff0)) === None)
    // fmt chunk declaring fewer than the 16 PCM body bytes is malformed,
    // not a license to read the next chunk's header as audio params
    val shortFmt = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shortFmt.put("RIFF".getBytes("US-ASCII")).putInt(32)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(4).putInt(0)
      .put("data".getBytes("US-ASCII")).putInt(100)
    assert(Multimodal.wavMeta(shortFmt.array()) === None)
  }

  test("audioMeta computes floor-millisecond durations from declared sizes") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 44101)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(22050).putInt(44100)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(44101)
    val docs = Seq((7L, b.array(), "audio", "s"))
      .toDF("doc_id", "payload", "mt", "source")
    val out = Multimodal.audioMeta(
      Multimodal.asMedia(docs, "doc_id", "payload", "mt", "source"))
      .collect()
    assert(out.length === 1)
    val m = out.head
    // 44101 bytes at 44100 B/s → floor(1000.02ms) = 1000
    assert(m.sample_rate === 22050 && m.channels === 1 &&
      m.data_bytes === 44101L && m.duration_ms === 1000L)
  }

  test("resizeStub truncates payloads without dropping rows") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 100, "image", "s")).toDF("doc_id", "text", "mt", "source")
    val resized = Multimodal.resizeStub(
      Multimodal.asMedia(docs, "doc_id", "text", "mt", "source"), 10)
      .collect()
    assert(resized.head.content.length === 10)
  }
}
