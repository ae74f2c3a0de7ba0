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

  test("mp4Meta walks the box tree: v0/v1 mvhd, largesize, junk rejected") {
    import java.nio.ByteBuffer
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length) // BE by default
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    def ftyp(brand: String): Array[Byte] =
      box("ftyp", brand.getBytes("US-ASCII") ++ new Array[Byte](4))
    def mvhd0(ts: Int, dur: Int): Array[Byte] = {
      val p = ByteBuffer.allocate(100)
      p.putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur)
      box("mvhd", p.array())
    }
    val trak = box("trak", Array.empty)
    val v0 = ftyp("isom") ++ box("free", new Array[Byte](4)) ++
      box("moov", mvhd0(600, 1234) ++ trak ++ trak)
    assert(Multimodal.mp4Meta(v0) === Some(("isom", 600L, 1234L, 2)))

    // version-1 mvhd: 64-bit duration past 2^32
    val bigDur = 5000000000L
    val p1 = ByteBuffer.allocate(32)
    p1.putInt(0x01000000).putLong(0L).putLong(0L)
      .putInt(90000).putLong(bigDur)
    val v1 = ftyp("mp42") ++ box("moov", box("mvhd", p1.array()) ++ trak)
    assert(Multimodal.mp4Meta(v1) === Some(("mp42", 90000L, bigDur, 1)))

    // size == 1 → BE64 largesize header on a skipped box
    val freeBody = new Array[Byte](4)
    val large = ByteBuffer.allocate(16 + freeBody.length)
    large.putInt(1).put("free".getBytes("US-ASCII"))
      .putLong(16L + freeBody.length).put(freeBody)
    assert(Multimodal.mp4Meta(
      large.array() ++ ftyp("isom") ++ box("moov", mvhd0(10, 20))) ===
      Some(("isom", 10L, 20L, 0)))

    // junk, truncation, corrupt sizes: None, no exceptions
    assert(Multimodal.mp4Meta("not a video file".getBytes) === None)
    assert(Multimodal.mp4Meta(Array[Byte]()) === None)
    assert(Multimodal.mp4Meta(v0.take(20)) === None) // moov lost
    val overrun = ByteBuffer.allocate(16)
    overrun.putInt(0x7fffffff).put("mdat".getBytes("US-ASCII"))
      .putInt(0).putInt(0)
    assert(Multimodal.mp4Meta(ftyp("isom") ++ overrun.array()) === None)
    val tiny = ByteBuffer.allocate(8)
    tiny.putInt(3).put("mdat".getBytes("US-ASCII")) // size < header
    assert(Multimodal.mp4Meta(ftyp("isom") ++ tiny.array()) === None)
    // malformed moov child poisons the parse, not just the child
    val badChild = ByteBuffer.allocate(8)
    badChild.putInt(0x7fffffff).put("trak".getBytes("US-ASCII"))
    assert(Multimodal.mp4Meta(
      ftyp("isom") ++ box("moov", mvhd0(10, 20) ++ badChild.array())) === None)
  }

  test("videoMeta computes floor-millisecond durations from mvhd units") {
    import spark.implicits._
    import java.nio.ByteBuffer
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val p = ByteBuffer.allocate(100)
    p.putInt(0).putInt(0).putInt(0).putInt(600).putInt(601)
    val mp4 = box("ftyp", "isom".getBytes ++ new Array[Byte](4)) ++
      box("moov", box("mvhd", p.array()) ++ box("trak", Array.empty))
    val docs = Seq((9L, mp4, "video", "s"), (10L, "junk".getBytes, "video", "s"))
      .toDF("doc_id", "payload", "mt", "source")
    val out = Multimodal.videoMeta(
      Multimodal.asMedia(docs, "doc_id", "payload", "mt", "source"))
      .collect()
    assert(out.length === 1) // the junk row is dropped
    val m = out.head
    // 601 units at 600/s → floor(1001.67 ms) = 1001
    assert(m.media_id === 9L && m.brand === "isom" && m.timescale === 600L &&
      m.duration === 601L && m.n_tracks === 1 && m.duration_ms === 1001L)
  }

  test("resizeStub truncates payloads without dropping rows") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 100, "image", "s")).toDF("doc_id", "text", "mt", "source")
    val resized = Multimodal.resizeStub(
      Multimodal.asMedia(docs, "doc_id", "text", "mt", "source"), 10)
      .collect()
    assert(resized.head.content.length === 10)
  }

  test("BMP round-trip: bmpGray encodes what bmpPixels decodes, exactly") {
    val f = (x: Int, y: Int) => (x * 7 + y * 13) % 256
    val bytes = Multimodal.bmpGray(36, 32, f)
    val Some((w, h, lum)) = Multimodal.bmpPixels(bytes)
    assert(w === 36 && h === 32)
    for (y <- 0 until 32; x <- 0 until 36)
      assert(lum(y * 36 + x) === f(x, y), s"pixel ($x,$y)")
    // truncated payload and non-BMP bytes are rejected, not mis-read
    assert(Multimodal.bmpPixels(bytes.take(bytes.length - 1)).isEmpty)
    assert(Multimodal.bmpPixels("not a bitmap".getBytes).isEmpty)
    assert(Multimodal.bmpPixels(null).isEmpty)
    // forged header with height = Int.MinValue (abs() stays negative):
    // rejected, not a NegativeArraySizeException
    val forged = bytes.clone()
    forged(22) = 0; forged(23) = 0; forged(24) = 0; forged(25) = 0x80.toByte
    assert(Multimodal.bmpPixels(forged).isEmpty)
  }

  test("dHash: brightness-invariant, near-dup-tolerant, discriminative") {
    def hashOf(f: (Int, Int) => Int): (Long, Long) = {
      val Some((w, h, lum)) =
        Multimodal.bmpPixels(Multimodal.bmpGray(36, 32, f))
      Multimodal.dHash(w, h, lum)
    }
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    // a smooth gradient (no mod-256 wrap): every horizontal cell step
    // strictly increases, so all 64 gradient bits are 1
    val base = (x: Int, y: Int) => 2 * x + 3 * y
    val h0 = hashOf(base)
    // brightness/contrast shift: cell averages move together, gradient
    // signs hold — the defining dHash invariance
    assert(hamming(h0, hashOf((x, y) => base(x, y) / 2 + 10)) === 0)
    // a small local edit (one 4x4 cell blacked out) flips only the bits
    // adjacent to that cell
    val edited = (x: Int, y: Int) =>
      if (x >= 12 && x < 16 && y >= 8 && y < 12) 0 else base(x, y)
    val dEdit = hamming(h0, hashOf(edited))
    assert(dEdit >= 1 && dEdit <= 2, s"edit moved $dEdit bits")
    // an unrelated pattern lands far away (expected ~32 of 64 bits)
    val other = (x: Int, y: Int) => ((x + 5 * y) * 31 + 7) % 256
    assert(hamming(h0, hashOf(other)) > 16)
  }

  test("imageDHash: real byte path in-plan, undecodable payloads dropped") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val media = Seq(1L, 2L, 99L).toDS().mapPartitions(_.map { id =>
      val content =
        if (id == 99L) "garbage".getBytes
        else Multimodal.bmpGray(36, 32,
          (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
      Multimodal.MediaRecord(id, "image", content, "synth")
    })(enc)
    val out = Multimodal.imageDHash(media).collect()
      .map(r => r.media_id -> (r.dhash_hi, r.dhash_lo)).toMap
    assert(out.keySet === Set(1L, 2L)) // garbage row dropped
    out.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
  }

  test("PNG round-trip: pngRgb encodes what pngPixels decodes, exactly") {
    val r = (x: Int, y: Int) => (x * 7 + y * 13) % 256
    val g = (x: Int, y: Int) => (x * 11 + y * 5) % 256
    val b = (x: Int, y: Int) => (x * 3 + y * 19) % 256
    val bytes = Multimodal.pngRgb(36, 32, r, g, b)
    // it really is a PNG payload (the header parser agrees on dims)
    assert(Multimodal.imageDims(bytes) ===
      Some(Multimodal.ImageDims("png", 36, 32)))
    val Some((w, h, lum)) = Multimodal.pngPixels(bytes)
    assert(w === 36 && h === 32)
    // losslessness is the oracle bridge: decoded luminance must equal
    // the formula's (r+g+b)/3 on every pixel
    for (y <- 0 until 32; x <- 0 until 36)
      assert(lum(y * 36 + x) === (r(x, y) + g(x, y) + b(x, y)) / 3,
        s"pixel ($x,$y)")
    // junk, truncation, null rejected — not mis-read
    assert(Multimodal.pngPixels("not a png".getBytes).isEmpty)
    assert(Multimodal.pngPixels(bytes.take(20)).isEmpty)
    assert(Multimodal.pngPixels(null).isEmpty)
    // decompression-bomb guard: a forged IHDR declaring 2^20 × 2^20 is
    // rejected FROM THE HEADER, before ImageIO materializes any raster
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val bomb = hx("89504E470D0A1A0A" + "0000000D49484452" +
      "00100000" + "00100000" + "0802000000")
    assert(Multimodal.pngPixels(bomb).isEmpty)
  }

  test("PNG and BMP encodings of the same gray image dHash identically") {
    // same luminance reduction on both decoders ⇒ codec-independent key
    val f = (x: Int, y: Int) => (2 * x + 3 * y) % 256
    val Some((bw, bh, blum)) =
      Multimodal.bmpPixels(Multimodal.bmpGray(36, 32, f))
    val Some((pw, ph, plum)) =
      Multimodal.pngPixels(Multimodal.pngRgb(36, 32, f, f, f))
    assert((bw, bh) === ((pw, ph)))
    assert(Multimodal.dHash(bw, bh, blum) === Multimodal.dHash(pw, ph, plum))
  }

  test("pngDHash: real codec path in-plan, undecodable payloads dropped") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val media = Seq(1L, 2L, 99L).toDS().mapPartitions(_.map { id =>
      val content =
        if (id == 99L) "garbage".getBytes
        else Multimodal.pngRgb(36, 32,
          (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt,
          (x, y) => ((id * 17 + x * 11 + y * 5) % 256).toInt,
          (x, y) => ((id * 23 + x * 3 + y * 19) % 256).toInt)
      Multimodal.MediaRecord(id, "image", content, "synth")
    })(enc)
    val out = Multimodal.pngDHash(media).collect()
      .map(r => r.media_id -> (r.dhash_hi, r.dhash_lo)).toMap
    assert(out.keySet === Set(1L, 2L)) // garbage row dropped
    out.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
  }

  test("WAV PCM round-trip: wavPcm16 encodes what wavPcm16Samples decodes") {
    val samples = Array(0, 1, -1, 32767, -32768, 1000, -999)
    val bytes = Multimodal.wavPcm16(1, 16000, samples)
    assert(Multimodal.wavPcm16Samples(bytes).map(_.toSeq) ===
      Some(samples.toSeq)) // sign extension exact at both extremes
    // out-of-range inputs clamp on encode, not wrap
    assert(Multimodal.wavPcm16Samples(
      Multimodal.wavPcm16(1, 8000, Array(40000, -40000))).map(_.toSeq) ===
      Some(Seq(32767, -32768)))
    // the header the encoder writes satisfies the header parser too
    assert(Multimodal.wavMeta(bytes) ===
      Some((1, 16000, 16, samples.length * 2L)))
    // truncated data payload rejected (unlike wavMeta's ranged-GET reads)
    assert(Multimodal.wavPcm16Samples(bytes.take(bytes.length - 1)).isEmpty)
    assert(Multimodal.wavPcm16Samples("not audio".getBytes).isEmpty)
    assert(Multimodal.wavPcm16Samples(null).isEmpty)
    // 8-bit fmt is not silently mis-read as 16-bit
    val eightBit = bytes.clone(); eightBit(34) = 8
    assert(Multimodal.wavPcm16Samples(eightBit).isEmpty)
    // ADVICE r10: a 16-bit NON-PCM format tag (fmt offset 0, file offset
    // 20-21 LE) must be rejected, not decoded as linear PCM — IEEE float
    // (3) and WAVE_FORMAT_EXTENSIBLE (0xFFFE) both declare 16 bits here
    val ieee = bytes.clone(); ieee(20) = 3
    assert(Multimodal.wavPcm16Samples(ieee).isEmpty)
    val ext = bytes.clone()
    ext(20) = 0xFE.toByte; ext(21) = 0xFF.toByte
    assert(Multimodal.wavPcm16Samples(ext).isEmpty)
    // the header-only reader still serves ranged-GET metadata for them
    assert(Multimodal.wavMeta(ieee).isDefined)
  }

  test("audioPcmFeatures: exact integer features, truncated rows dropped") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val media = Seq(1L, 99L).toDS().mapPartitions(_.map { id =>
      val content =
        if (id == 99L) Multimodal.wavPcm16(1, 8000, Array(1, 2, 3)).take(46)
        else Multimodal.wavPcm16(1, 8000, Array(3, -4, 0, 5, -1))
      Multimodal.MediaRecord(id, "audio", content, "synth")
    })(enc)
    val out = Multimodal.audioPcmFeatures(media).collect()
    assert(out.map(_.media_id).toSeq === Seq(1L)) // truncated row dropped
    val f = out.head
    assert(f.n_samples === 5L)
    assert(f.sum_amp === 3L)          // 3 - 4 + 0 + 5 - 1
    assert(f.sum_sq === 51L)          // 9 + 16 + 0 + 25 + 1
    assert(f.peak_abs === 5L)
    // sign (<0) sequence: F T F F T → changes at 3 of 4 adjacent pairs
    assert(f.zero_crossings === 3L)
  }

  test("pcmFingerprint: amplitude-invariant, edit-local, discriminative") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val n = 330 // 10 samples per window, exact
    val base = Array.tabulate(n)(i => ((i * 71) % 401) - 200)
    val f0 = Multimodal.pcmFingerprint(base)
    assert(f0 >= 0L && f0 < (1L << 32))
    // amplitude scaling multiplies every window energy by 4: bits hold
    assert(Multimodal.pcmFingerprint(base.map(_ * 2)) === f0)
    // silencing one window's span flips only bits adjacent to it
    val edited = base.clone()
    for (i <- 100 until 110) edited(i) = 0
    val dEdit = hamming(f0, Multimodal.pcmFingerprint(edited))
    assert(dEdit >= 1 && dEdit <= 4, s"edit moved $dEdit bits")
    // an unrelated stream lands far away
    val other = Array.tabulate(n)(i => ((i * 131 + 17) % 797) - 398)
    assert(hamming(f0, Multimodal.pcmFingerprint(other)) > 8)
    // degenerate inputs are total, not crashes
    assert(Multimodal.pcmFingerprint(Array.empty[Int]) === 0L)
    assert(Multimodal.pcmFingerprint(Array(5)) === 0L)
  }

  test("bmpFrameSlices: self-delimiting walk, truncation ends it cleanly") {
    def frame(seed: Int): Array[Byte] =
      Multimodal.bmpGray(36, 32, (x, y) => (seed + x + y) % 256)
    val f0 = frame(1); val f1 = frame(2); val f2 = frame(3)
    val container = f0 ++ f1 ++ f2
    val got = Multimodal.bmpFrameSlices(container)
    assert(got.length === 3)
    assert(got(0).toSeq === f0.toSeq && got(2).toSeq === f2.toSeq)
    // a truncated tail frame yields only the complete leading frames
    assert(Multimodal.bmpFrameSlices(
      container.take(f0.length + f1.length + 10)).length === 2)
    // junk mid-stream stops the walk without overrunning
    assert(Multimodal.bmpFrameSlices(f0 ++ "junk".getBytes).length === 1)
    assert(Multimodal.bmpFrameSlices("junk".getBytes).length === 0)
    assert(Multimodal.bmpFrameSlices(null).length === 0)
    // a forged size < 54 cannot loop forever
    val forged = f0.clone(); forged(2) = 10; forged(3) = 0
    forged(4) = 0; forged(5) = 0
    assert(Multimodal.bmpFrameSlices(forged).length === 0)
  }

  test("videoFrameHashes: stride sampling, per-frame hashes, bad frame dropped") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val media = Seq(5L).toDS().mapPartitions(_.map { id =>
      val frames = (0 until 6).map { f =>
        Multimodal.bmpGray(36, 32,
          (x, y) => ((id * 31 + f * 47 + x * 7 + y * 13) % 256).toInt)
      }
      Multimodal.MediaRecord(id, "video", frames.reduce(_ ++ _), "synth")
    })(enc)
    val out = Multimodal.videoFrameHashes(media, sampleEvery = 2).collect()
    assert(out.map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4))
    // each sampled frame hashes like the standalone image path
    val lone = Multimodal.imageDHash(
      Seq(5L).toDS().mapPartitions(_.map { id =>
        Multimodal.MediaRecord(id, "image",
          Multimodal.bmpGray(36, 32,
            (x, y) => ((id * 31 + 2 * 47 + x * 7 + y * 13) % 256).toInt),
          "synth")
      })(enc)).collect().head
    val fr2 = out.find(_.frame_idx === 2).get
    assert((fr2.dhash_hi, fr2.dhash_lo) === (lone.dhash_hi, lone.dhash_lo))
  }

  test("dhashNearDupPairs: planted pairs recalled, cap drops degenerate bands") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    // 20 bases + 20 one-cell-edited copies (edit flips <= 2 bits)
    def mk(n: Int) = Seq.range(0L, n.toLong).toDS().mapPartitions(_.map { id =>
      val b = id % 10
      val edited = id >= 10
      Multimodal.MediaRecord(id, "image",
        Multimodal.bmpGray(36, 32, (x, y) =>
          if (edited && x >= 12 && x < 16 && y >= 8 && y < 12) 0
          else ((b * 31 + x * (7 + b % 5) + y * (13 + b % 7)) % 256).toInt),
        "synth")
    })(enc)
    val pairs = Multimodal.dhashNearDupPairs(
      Multimodal.imageDHash(mk(20)), maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0L until 10L)
      assert(pairs.contains((i, i + 10)), s"planted pair ($i, ${i + 10}) lost")
    // a tiny bucket cap drops every band (all buckets exceed it): no
    // candidates, no pairs — the fan-out bound is real
    assert(Multimodal.dhashNearDupPairs(
      Multimodal.imageDHash(mk(20)), maxHamming = 4, maxBucket = 0)
      .count() === 0L)
    // hamming > 7 would break the 8-band pigeonhole recall guarantee
    intercept[IllegalArgumentException] {
      Multimodal.dhashNearDupPairs(Multimodal.imageDHash(mk(4)), maxHamming = 8)
    }
  }
}
