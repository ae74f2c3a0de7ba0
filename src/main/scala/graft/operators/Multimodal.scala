package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing ([EXT], SURVEY.md §0.1): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature-extract
  * / frame-sample stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition behavior — is
  * real and tested. The header DECODE is real too: `imageDims` parses
  * PNG IHDR and JPEG SOF segments for pixel dimensions (no codec library
  * needed — it is pure byte-walking, oracled end to end in
  * q_media_features). Pixel-level features are real for uncompressed
  * BMP ([[bmpPixels]] → [[dHash]], the perceptual near-dup key, oracled
  * in q_image_dhash), and sample-level audio features are real for
  * uncompressed 16-bit PCM WAV ([[wavPcm16Samples]] →
  * [[audioPcmFeatures]]/[[audioFingerprints]], oracled in q_audio_pcm /
  * q_audio_fp), and frame sampling is real for concatenated-BMP
  * multi-frame containers ([[bmpFrameSlices]] → [[videoFrameHashes]],
  * oracled in q_video_frames); only COMPRESSED-codec
  * feature extraction is
  * stubbed (this container ships no image/audio codecs): `decodeStub`
  * derives a deterministic fake feature vector from the bytes. Swap that
  * part for a real codec (javacv / a JNI decoder) without touching any
  * call site.
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

  /** Extracted features (decode output batch shape). `img_format`/`width`/
    * `height` come from the real header parse and are null for payloads
    * that are not recognizable images.
    */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      n_frames: Int,
      img_format: String,
      width: Option[Int],
      height: Option[Int],
      features: Array[Float])

  val FeatureDim = 8

  /** Parsed image header. */
  final case class ImageDims(format: String, width: Int, height: Int)

  /** Real image-header decode, no codec library: PNG dimensions live in the
    * IHDR chunk (bytes 16-23 big-endian after the 8-byte signature +
    * 4-byte length + "IHDR"); JPEG requires walking the marker segments to
    * the first start-of-frame (0xC0-0xCF minus the non-frame C4/C8/CC),
    * whose payload is precision(1), height(2), width(2) big-endian.
    * Returns None for anything unrecognizable — truncated headers
    * included.
    */
  def imageDims(bytes: Array[Byte]): Option[ImageDims] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i)))
      Some(ImageDims("png", be32(16), be32(20)))
    else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < bytes.length) {
        if (u8(i) != 0xff) return None // lost marker sync
        val marker = u8(i + 1)
        if (marker == 0xff) i += 1 // fill byte
        // standalone markers carry NO length word: TEM (0x01), RSTn
        // (0xd0-0xd7), and a stray mid-stream SOI (0xd8). Reading a bogus
        // 16-bit "length" for these would skip into garbage on malformed
        // files instead of failing cleanly.
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2
        // EOI before any SOF: the image ended without a frame header
        else if (marker == 0xd9) return None
        else {
          val len = be16(i + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            return if (i + 8 < bytes.length)
              Some(ImageDims("jpeg", be16(i + 7), be16(i + 5)))
            else None
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Parsed WAV header (the audio analogue of [[ImageDims]]). */
  final case class AudioMeta(
      media_id: Long,
      channels: Int,
      sample_rate: Int,
      bits_per_sample: Int,
      data_bytes: Long,
      duration_ms: Long)

  /** Real WAV/RIFF header parse, no codec library: verify the RIFF/WAVE
    * magic, then walk the chunk list (4-byte id + LE32 size, word-
    * aligned) for `fmt ` (channels LE16 @+2, sample rate LE32 @+4, bits
    * LE16 @+14 inside the chunk body) and `data` (declared payload
    * size). Returns (channels, rate, bits, dataBytes); None for
    * truncated or non-WAV input. The data bytes themselves need not be
    * present — ingest often reads headers from a ranged GET.
    */
  def wavMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int): String =
      if (i + 4 <= bytes.length)
        new String(bytes.slice(i, i + 4), "US-ASCII")
      else ""
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[Long] = None
    while (i + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i)
      val sz = le32(i + 4)
      if (id == "fmt ") {
        // a fmt body shorter than the 16 PCM bytes would read the NEXT
        // chunk's header as channels/rate — malformed, not recoverable
        if (sz < 16 || i + 8 + 16 > bytes.length) return None
        fmt = Some((le16(i + 10), le32(i + 12).toInt, le16(i + 22)))
      }
      if (id == "data") data = Some(sz)
      // advance in Long: a corrupt declared size near 2^31 would wrap an
      // Int increment negative and index out of bounds; any next offset
      // past the buffer just ends the walk with whatever was found
      val next = i.toLong + 8L + sz + (sz & 1L)
      i = if (next > bytes.length.toLong) bytes.length else next.toInt
    }
    for { (c, r, b) <- fmt; d <- data } yield (c, r, b, d)
  }

  /** WAV header metadata per media record; duration from the declared
    * data size and the computed byte rate (floor milliseconds). Records
    * that do not parse are dropped — the caller separates audio from
    * other modalities upstream.
    */
  def audioMeta(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    implicit val enc = Encoders.product[AudioMeta]
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = if (m.content == null) Array.empty[Byte] else m.content
        wavMeta(bytes).collect {
          case (c, r, b, d) if c > 0 && r > 0 && b > 0 =>
            val byteRate = r.toLong * c * (b / 8)
            AudioMeta(m.media_id, c, r, b, d,
              if (byteRate > 0) d * 1000L / byteRate else 0L)
        }
      }
    }
  }

  /** Encode interleaved 16-bit PCM samples as a REAL canonical WAV file
    * (44-byte header + LE16 data) — the audio analogue of [[bmpGray]]:
    * pure byte math, no codec, the synthesizer for fixture audio this
    * container can produce. Samples are clamped to the signed-16 range.
    */
  def wavPcm16(channels: Int, rate: Int, samples: Array[Int]): Array[Byte] = {
    require(channels > 0 && rate > 0, s"bad wav params ch=$channels rate=$rate")
    val dataB = samples.length * 2
    val b = new Array[Byte](44 + dataB)
    def tag(i: Int, s: String): Unit = {
      var k = 0; while (k < 4) { b(i + k) = s.charAt(k).toByte; k += 1 }
    }
    def le16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def le32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    tag(0, "RIFF"); le32(4, 36 + dataB); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1) // PCM
    le16(22, channels); le32(24, rate)
    le32(28, rate * channels * 2); le16(32, channels * 2); le16(34, 16)
    tag(36, "data"); le32(40, dataB)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      le16(44 + i * 2, s)
      i += 1
    }
    b
  }

  /** Real 16-bit PCM sample decode: walk the RIFF chunk list to the
    * `data` chunk and read interleaved LE16 signed samples. Requires a
    * 16-bit PCM `fmt ` chunk and the FULL declared data payload present
    * (unlike [[wavMeta]], which serves ranged-GET header reads) — feature
    * extraction over a truncated byte range would silently hash
    * differently, so it is rejected instead. Returns None otherwise.
    */
  def wavPcm16Samples(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int): String =
      if (i + 4 <= bytes.length) new String(bytes.slice(i, i + 4), "US-ASCII")
      else ""
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var bits = -1
    var fmtTag = -1
    var dataAt = -1L
    var dataSz = -1L
    while (i + 8 <= bytes.length && (bits < 0 || dataAt < 0)) {
      val id = tag(i)
      val sz = le32(i + 4)
      if (id == "fmt ") {
        if (sz < 16 || i + 8 + 16 > bytes.length) return None
        // fmt offset 0 = audioFormat tag; anything but 1 (linear PCM) —
        // A-law/µ-law/float/EXTENSIBLE containers can all declare 16
        // bits — is NOT LE16 linear PCM and must be rejected, not
        // silently mis-decoded (ADVICE r10)
        fmtTag = le16(i + 8)
        bits = le16(i + 22)
      }
      if (id == "data") { dataAt = i + 8L; dataSz = sz }
      val next = i.toLong + 8L + sz + (sz & 1L)
      i = if (next > bytes.length.toLong) bytes.length else next.toInt
    }
    if (bits != 16 || fmtTag != 1 || dataAt < 0 || dataSz % 2 != 0) return None
    if (dataAt + dataSz > bytes.length) return None // truncated payload
    val n = (dataSz / 2).toInt
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      out(k) = le16((dataAt + k * 2L).toInt).toShort.toInt // sign-extend
      k += 1
    }
    Some(out)
  }

  /** Exact-integer PCM features per media record — the audio analogue of
    * the dHash pixel path, every figure replayable by any engine:
    * sample count, amplitude sum, energy (sum of squares), peak absolute
    * amplitude, and zero crossings (adjacent pairs whose `< 0` signs
    * differ, over the interleaved stream). No floats anywhere, so the
    * hash oracle is bit-exact; derive RMS/dBFS downstream if needed.
    */
  final case class AudioPcm(
      media_id: Long,
      n_samples: Long,
      sum_amp: Long,
      sum_sq: Long,
      peak_abs: Long,
      zero_crossings: Long)

  /** PCM feature extraction over a media Dataset: real byte path (WAV
    * chunk walk → LE16 decode → integer aggregates), narrow
    * mapPartitions; the binary payload never shuffles — only the 6-long
    * feature rows do. Undecodable or truncated payloads are dropped.
    */
  def audioPcmFeatures(media: Dataset[MediaRecord]): Dataset[AudioPcm] = {
    implicit val enc = Encoders.product[AudioPcm]
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        wavPcm16Samples(m.content).map { s =>
          var sum = 0L; var ssq = 0L; var peak = 0L; var zc = 0L
          var k = 0
          while (k < s.length) {
            val v = s(k)
            sum += v; ssq += v.toLong * v
            if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
            if (k > 0 && ((s(k - 1) < 0) != (v < 0))) zc += 1
            k += 1
          }
          AudioPcm(m.media_id, s.length.toLong, sum, ssq, peak, zc)
        }
      }
    }
  }

  /** Energy-gradient audio fingerprint — the audio analogue of [[dHash]]:
    * split the interleaved sample stream into `windows` near-equal spans
    * (sample i lands in window `i*windows/n`, exact integer division),
    * sum each window's energy (sum of squares), then one bit per adjacent
    * window pair (`right > left`). Amplitude scaling multiplies every
    * energy by the same factor, so the bits — like dHash under a
    * brightness shift — are invariant; a local edit flips only the bits
    * around the edited span. 33 windows → 32 bits, non-negative in a
    * Long, bit `windows-2-w` for pair (w, w+1). Empty input → 0L.
    */
  def pcmFingerprint(samples: Array[Int], windows: Int = 33): Long = {
    require(windows >= 2 && windows <= 64, s"windows out of range: $windows")
    val n = samples.length
    val e = new Array[Long](windows)
    var i = 0
    while (i < n) {
      val w = (i.toLong * windows / n).toInt
      e(w) += samples(i).toLong * samples(i)
      i += 1
    }
    var bits = 0L
    var w = 0
    while (w < windows - 1) {
      if (e(w + 1) > e(w)) bits |= 1L << (windows - 2 - w)
      w += 1
    }
    bits
  }

  /** Per-record audio fingerprint row. */
  final case class AudioFingerprint(media_id: Long, fp: Long)

  /** Fingerprint extraction over a media Dataset: real byte path (WAV
    * chunk walk → LE16 decode → [[pcmFingerprint]]), narrow
    * mapPartitions; pair the output with a banded self-join on fp
    * prefixes for audio near-dup candidates at scale, exactly like the
    * [[imageDHash]] pairing. Undecodable payloads are dropped.
    */
  def audioFingerprints(media: Dataset[MediaRecord],
      windows: Int = 33): Dataset[AudioFingerprint] = {
    implicit val enc = Encoders.product[AudioFingerprint]
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        wavPcm16Samples(m.content).map { s =>
          AudioFingerprint(m.media_id, pcmFingerprint(s, windows))
        }
      }
    }
  }

  /** Parsed MP4 movie header (the video analogue of [[AudioMeta]]). */
  final case class VideoMeta(
      media_id: Long,
      brand: String,
      timescale: Long,
      duration: Long,
      n_tracks: Int,
      duration_ms: Long)

  /** Real MP4/ISO-BMFF box walk, no codec library: boxes are
    * `[BE32 size][4-char type][payload]`, with `size == 1` meaning a
    * BE64 largesize follows the type and `size == 0` meaning the box
    * runs to end of buffer. Reads the `ftyp` major brand, then walks the
    * `moov` container for `mvhd` (version 0: timescale BE32 at payload
    * +12, duration BE32 at +16; version 1: BE32 at +20, BE64 at +24)
    * and counts `trak` children. Returns None for non-BMFF input or any
    * malformed size that would walk out of bounds — offsets advance in
    * Long so a corrupt declared size cannot wrap an Int index.
    */
  def mp4Meta(bytes: Array[Byte]): Option[(String, Long, Long, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String =
      if (i + 4 <= bytes.length)
        new String(bytes.slice(i, i + 4), "US-ASCII")
      else ""
    // walk the box list in [from, until); false on any malformed size
    def walk(from: Long, until: Long)(f: (String, Long, Long) => Unit): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val sz0 = be32(i.toInt)
        val typ = tag(i.toInt + 4)
        var hdr = 8L
        var sz = sz0
        if (sz0 == 1L) {
          if (i + 16 > until) return false
          sz = be64(i.toInt + 8); hdr = 16L
        } else if (sz0 == 0L) sz = until - i
        if (sz < hdr || i + sz > until) return false
        f(typ, i + hdr, i + sz)
        i += sz
      }
      true
    }
    var brand: Option[String] = None
    var mvhd: Option[(Long, Long)] = None
    var tracks = 0
    var wellFormed = true
    val okTop = walk(0L, bytes.length.toLong) { (typ, ps, pe) =>
      if (typ == "ftyp" && brand.isEmpty && ps + 4 <= pe)
        brand = Some(tag(ps.toInt))
      if (typ == "moov") {
        val okMoov = walk(ps, pe) { (t2, q, qe) =>
          if (t2 == "mvhd" && mvhd.isEmpty && q < qe) {
            val v = u8(q.toInt)
            if (v == 0 && q + 20 <= qe)
              mvhd = Some((be32(q.toInt + 12), be32(q.toInt + 16)))
            else if (v == 1 && q + 32 <= qe)
              mvhd = Some((be32(q.toInt + 20), be64(q.toInt + 24)))
          }
          if (t2 == "trak") tracks += 1
        }
        if (!okMoov) wellFormed = false
      }
    }
    if (!okTop || !wellFormed) None
    else for { b <- brand; (ts, d) <- mvhd } yield (b, ts, d, tracks)
  }

  /** MP4 movie-header metadata per media record; duration in both mvhd
    * units and floor milliseconds (`duration * 1000 / timescale`).
    * Records that do not parse, or declare a zero timescale, are dropped.
    */
  def videoMeta(media: Dataset[MediaRecord]): Dataset[VideoMeta] = {
    implicit val enc = Encoders.product[VideoMeta]
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        val bytes = if (m.content == null) Array.empty[Byte] else m.content
        mp4Meta(bytes).collect {
          case (b, ts, d, n) if ts > 0L =>
            VideoMeta(m.media_id, b, ts, d, n, d * 1000L / ts)
        }
      }
    }
  }

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

  /** Decode + feature extraction: the image-header parse (`imageDims`) is
    * real; the pixel-level features are a deterministic STUB (see object
    * scaladoc). A real implementation would open the codec once per
    * partition and decode each record — the mapPartitions shape already
    * amortizes that init.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { iter =>
      // per-partition init would go here (codec/model load — stubbed)
      iter.map { m =>
        val bytes = if (m.content == null) Array.empty[Byte] else m.content
        val frames = frameOffsets(bytes.length, frameSize = 64)
        val dims = imageDims(bytes)
        val feats = Array.tabulate(FeatureDim) { d =>
          // deterministic fake: byte-sum of every FeatureDim-th byte, scaled
          var acc = 0L
          var i = d
          while (i < bytes.length) { acc += (bytes(i) & 0xff); i += FeatureDim }
          (acc % 1000L) / 1000.0f
        }
        MediaFeatures(m.media_id, m.media_type, bytes.length.toLong,
          frames.length, dims.map(_.format).orNull,
          dims.map(_.width), dims.map(_.height), feats)
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

  // -------- real pixel features: BMP decode + dHash (no codec library) ---

  /** Encode a grayscale image as a REAL 24-bit uncompressed BMP (each
    * channel carries the gray value): 54-byte header, bottom-up rows,
    * 4-byte row padding. Pure byte math — the synthesizer for fixture
    * imagery this container can produce without a codec.
    */
  def bmpGray(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = (width * 3 + 3) / 4 * 4
    val size = 54 + stride * height
    val b = new Array[Byte](size)
    def le16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def le32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, 54); le32(14, 40)
    le32(18, width); le32(22, height) // positive height = bottom-up
    le16(26, 1); le16(28, 24); le32(34, stride * height)
    var y = 0
    while (y < height) {
      val row = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val g = (pix(x, y) & 0xff).toByte
        val o = row + x * 3
        b(o) = g; b(o + 1) = g; b(o + 2) = g
        x += 1
      }
      y += 1
    }
    b
  }

  /** Real BMP pixel decode (24-bit uncompressed, bottom-up or top-down):
    * returns (width, height, luminance row-major top-down) where
    * luminance = (r + g + b) / 3 integer — None for anything that is not
    * a well-formed 24bpp BI_RGB BMP (truncated payloads included).
    */
  def bmpPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 54 ||
      bytes(0) != 'B' || bytes(1) != 'M') return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val offset = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    if (hRaw == Int.MinValue) return None // abs() would stay negative
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    if (le16(28) != 24 || le32(30) != 0) return None // 24bpp BI_RGB only
    if (w <= 0 || h == 0 || w > (1 << 20) || h > (1 << 20)) return None
    val stride = (w * 3 + 3) / 4 * 4
    if (offset < 54 || offset.toLong + stride.toLong * h > bytes.length)
      return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val row = offset + (if (bottomUp) (h - 1 - y) else y) * stride
      var x = 0
      while (x < w) {
        val o = row + x * 3
        out(y * w + x) = (u8(o) + u8(o + 1) + u8(o + 2)) / 3
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** Difference hash (dHash) over a decoded luminance grid: box-average
    * down to a 9-wide × 8-tall grid (cells floor-averaged — exact integer
    * math), then one bit per horizontally adjacent cell pair
    * (`right > left`). 64 bits, returned as two non-negative 32-bit
    * halves (rows 0-3 / rows 4-7, bit 31-(r·8+c)) so neither engine's
    * checked 64-bit arithmetic can overflow packing the sign bit. The
    * standard perceptual near-dup key: brightness/contrast shifts
    * preserve most gradient signs, so near-copies land within a few bits
    * of hamming distance. Requires width % 9 == 0 and height % 8 == 0
    * (exact boxes keep the hash engine-replayable; a general resampler
    * would interpolate).
    */
  def dHash(width: Int, height: Int, lum: Array[Int]): (Long, Long) = {
    require(width % 9 == 0 && height % 8 == 0,
      s"dHash needs w%9==0 and h%8==0, got ${width}x$height")
    val cw = width / 9
    val ch = height / 8
    val g = Array.ofDim[Int](8, 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        var s = 0L
        var dy = 0
        while (dy < ch) {
          var dx = 0
          val base = (r * ch + dy) * width + c * cw
          while (dx < cw) { s += lum(base + dx); dx += 1 }
          dy += 1
        }
        g(r)(c) = (s / (cw.toLong * ch)).toInt
        c += 1
      }
      r += 1
    }
    var hi = 0L; var lo = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r)(c + 1) > g(r)(c)) {
          if (r < 4) hi |= 1L << (31 - (r * 8 + c))
          else lo |= 1L << (31 - ((r - 4) * 8 + c))
        }
        c += 1
      }
      r += 1
    }
    (hi, lo)
  }

  // -------- compressed-codec pixel path: PNG via the JDK's ImageIO ------

  /** Encode an RGB image as a REAL PNG via `javax.imageio` (on every JVM;
    * PNG is lossless, so decode(encode(pix)) returns the exact channel
    * values — the property that lets a SQL oracle replay the pixel
    * formula without ever seeing the bytes). Deterministic input ⇒
    * deterministic decoded pixels; the encoder's BYTE stream may vary
    * across JVMs (compression settings), which is why oracles replay the
    * pixel math, not the payload. This closes the compressed-codec gap
    * the BMP path ([[bmpGray]]) left: JPEG stays out of scope — lossy
    * decode is not oracle-replayable.
    */
  def pngRgb(width: Int, height: Int,
      r: (Int, Int) => Int, g: (Int, Int) => Int,
      b: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per call
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y,
          ((r(x, y) & 0xff) << 16) | ((g(x, y) & 0xff) << 8) | (b(x, y) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real PNG pixel decode via `javax.imageio`: (width, height, luminance
    * row-major top-down), luminance = (r + g + b) / 3 integer — the same
    * reduction as [[bmpPixels]], so the same image encoded as BMP or PNG
    * hashes identically (MultimodalSpec pins that). None for undecodable
    * payloads or images past the [[bmpPixels]] dimension guards.
    */
  def pngPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 8) return None
    // PNG signature probe first: ImageIO.read swallows arbitrary garbage
    // at real cost (reader discovery) — reject cheap, decode expensive
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) // \x89PNG\r\n\x1a\n
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xff) != sig(i)) return None
      i += 1
    }
    // dimension guard BEFORE decode, from the IHDR header: ImageIO.read
    // materializes the full pixel raster, so a forged 2^30-pixel header
    // (a classic decompression bomb — tiny payload, huge declared dims)
    // would allocate gigabytes before any post-decode check ran. 1<<13
    // per side (64M pixels) is far above any feature-extraction input.
    val dims = imageDims(bytes)
    if (!dims.exists(d => d.format == "png" && d.width > 0 && d.height > 0 &&
        d.width <= (1 << 13) && d.height <= (1 << 13))) return None
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0 || w > (1 << 13) || h > (1 << 13)) return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(y * w + x) =
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** [[imageDHash]] over PNG payloads: same narrow mapPartitions shape,
    * same hash — only the decoder differs. Undecodable payloads dropped.
    */
  def pngDHash(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    implicit val enc = Encoders.product[ImageHash]
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        pngPixels(m.content).collect {
          case (w, h, lum) if w % 9 == 0 && h % 8 == 0 =>
            val (hi, lo) = dHash(w, h, lum)
            ImageHash(m.media_id, hi, lo)
        }
      }
    }
  }

  /** Split a concatenated-BMP stream into frames: each BMP is
    * self-delimiting (LE32 file size at offset 2), so the walk is
    * `[offset, offset+size)` per frame — a real multi-frame container
    * needing no codec, the video fixture this container can produce.
    * Stops cleanly at the first malformed or truncated frame header
    * (returns the frames before it); a declared size < 54 or past the
    * buffer ends the walk rather than looping or overrunning.
    */
  def bmpFrameSlices(bytes: Array[Byte]): Array[Array[Byte]] = {
    if (bytes == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0L
    while (i + 54 <= bytes.length) {
      if (bytes(i.toInt) != 'B' || bytes(i.toInt + 1) != 'M') return out.toArray
      def u8(k: Long): Long = (bytes(k.toInt) & 0xff).toLong
      val sz = u8(i + 2) | (u8(i + 3) << 8) | (u8(i + 4) << 16) | (u8(i + 5) << 24)
      if (sz < 54 || i + sz > bytes.length) return out.toArray
      out += java.util.Arrays.copyOfRange(bytes, i.toInt, (i + sz).toInt)
      i += sz
    }
    out.toArray
  }

  /** Per-frame perceptual hash row (video near-dup signature element). */
  final case class FrameHash(
      media_id: Long, frame_idx: Int, dhash_hi: Long, dhash_lo: Long)

  /** REAL frame sampling + per-frame features over a multi-frame media
    * Dataset: walk the concatenated-BMP container ([[bmpFrameSlices]]),
    * keep every `sampleEvery`-th frame (index 0, k, 2k, … — the
    * keyframe-stride shape of a real video sampler), decode each kept
    * frame's pixels, and dHash it. Narrow mapPartitions — the multi-frame
    * payload never shuffles, only the hash rows do; undecodable frames
    * are dropped individually (a corrupt frame does not sink its video).
    */
  def videoFrameHashes(media: Dataset[MediaRecord],
      sampleEvery: Int = 1): Dataset[FrameHash] = {
    require(sampleEvery >= 1, s"sampleEvery must be >= 1: $sampleEvery")
    implicit val enc = Encoders.product[FrameHash]
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        bmpFrameSlices(m.content).zipWithIndex.iterator.collect {
          case (frame, idx) if idx % sampleEvery == 0 =>
            bmpPixels(frame).collect {
              case (w, h, lum) if w % 9 == 0 && h % 8 == 0 =>
                val (hi, lo) = dHash(w, h, lum)
                FrameHash(m.media_id, idx, hi, lo)
            }
        }.flatten
      }
    }
  }

  /** Per-image perceptual hash row. */
  final case class ImageHash(media_id: Long, dhash_hi: Long, dhash_lo: Long)

  /** Perceptual near-dup pairing over dHash rows: the 64 bits split into
    * 8 byte-bands (pigeonhole: pairs within hamming ≤ 7 share at least
    * one band; ≤ `maxHamming` ≤ 7 therefore has recall 1.0), candidates
    * from a same-(band, value) equi-join — never all-pairs — then exact
    * hamming verification via xor bit counts. Degenerate bands (a byte
    * value held by more than `maxBucket` images, e.g. the all-zero byte
    * of flat regions at corpus scale) are dropped from candidate
    * generation, the same df-cap contract as the text LSH paths: recall
    * on pairs whose every shared band is degenerate is sacrificed for a
    * hard bound on join fan-out. Output: (id_a, id_b, hamming) with
    * id_a < id_b, one row per verified pair.
    */
  def dhashNearDupPairs(hashes: Dataset[ImageHash], maxHamming: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0,7] for banded recall 1.0: $maxHamming")
    val df = hashes.toDF()
    val bandCols = (0 to 3).map(k =>
      shiftright(col("dhash_hi"), 24 - 8 * k).bitwiseAND(lit(255L))) ++
      (0 to 3).map(k =>
        shiftright(col("dhash_lo"), 24 - 8 * k).bitwiseAND(lit(255L)))
    // eager localCheckpoint: three consumers follow (bucket counts + both
    // join sides) — without it each re-runs the upstream decode lineage
    // (the hash rows are 4 longs/image; the decode is the expensive part)
    val banded = df
      .select(col("media_id"), col("dhash_hi"), col("dhash_lo"),
        array(bandCols: _*).as("__bands"))
      .select(col("media_id"), col("dhash_hi"), col("dhash_lo"),
        posexplode(col("__bands")).as(Seq("band", "bval")))
      .localCheckpoint(true)
    val capped = banded.join(
      banded.groupBy("band", "bval").count()
        .filter(col("count") <= maxBucket)
        .select(col("band").as("band_ok"), col("bval").as("bval_ok")),
      col("band") === col("band_ok") && col("bval") === col("bval_ok"))
      .drop("band_ok", "bval_ok")
    val a = capped.select(col("media_id").as("id_a"),
      col("dhash_hi").as("hi_a"), col("dhash_lo").as("lo_a"),
      col("band"), col("bval"))
    val b = capped.select(col("media_id").as("id_b"),
      col("dhash_hi").as("hi_b"), col("dhash_lo").as("lo_b"),
      col("band").as("band_b"), col("bval").as("bval_b"))
    a.join(b, col("band") === col("band_b") &&
        col("bval") === col("bval_b") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
      .distinct()
      .withColumn("hamming",
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Perceptual-hash extraction over a media Dataset: REAL byte path
    * (BMP pixel decode → box downscale → gradient bits), narrow
    * mapPartitions, binary payloads never shuffle — only the 3-long hash
    * rows do. Undecodable payloads are dropped (they have no pixels to
    * hash); pair the output with a ≤`maxHamming` self-join on a banded
    * key for multimodal near-dup candidates at scale.
    */
  def imageDHash(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    implicit val enc = Encoders.product[ImageHash]
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        bmpPixels(m.content).collect {
          case (w, h, lum) if w % 9 == 0 && h % 8 == 0 =>
            val (hi, lo) = dHash(w, h, lum)
            ImageHash(m.media_id, hi, lo)
        }
      }
    }
  }
}
