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

    // ORACLED audio decode: canonical 44-byte WAV headers synthesized
    // in-plan (little-endian hex assembled byte-wise from fixture
    // columns), then Multimodal.wavMeta walks the real RIFF chunk list
    // and recovers channels/rate/bits/data size. DuckDB predicts the
    // fields straight from the synthesis formulas, so an endianness or
    // chunk-walk bug hash-mismatches.
    "q_audio_meta" -> ((s, dir) => {
      import org.apache.spark.sql.Column
      val channels = (col("doc_id") % 2 + 1).cast("long")
      val rate = ((col("doc_id") % 5 + 1) * 8000).cast("long")
      val dataB = (coalesce(col("n_chars"), lit(0L)) * 4).cast("long")
      val byteRate = rate * channels * lit(2L)
      val blockAlign = channels * lit(2L)
      def le16h(v: Column): Column = concat(
        lpad(hex(v.bitwiseAND(lit(255L))), 2, "0"),
        lpad(hex(shiftright(v, 8).bitwiseAND(lit(255L))), 2, "0"))
      def le32h(v: Column): Column = concat(
        le16h(v.bitwiseAND(lit(65535L))),
        le16h(shiftright(v, 16).bitwiseAND(lit(65535L))))
      val wavHex = concat(
        lit("52494646"), le32h(dataB + 36), lit("57415645"), // RIFF..WAVE
        lit("666D7420"), le32h(lit(16L)), le16h(lit(1L)),    // fmt , PCM
        le16h(channels), le32h(rate), le32h(byteRate),
        le16h(blockAlign), le16h(lit(16L)),
        lit("64617461"), le32h(dataB))                       // data
      val media = Multimodal.asMedia(
        t(s, dir, "documents")
          .withColumn("media_type", lit("audio"))
          .withColumn("payload", unhex(wavHex)),
        "doc_id", "payload", "media_type", "source")
      Multimodal.audioMeta(media).toDF()
    }),

    // ORACLED video decode: minimal ISO-BMFF files synthesized in-plan
    // (big-endian hex: ftyp with a fixture-derived brand, moov holding a
    // version-0 mvhd plus 1-3 empty trak boxes), then Multimodal.mp4Meta
    // walks the real box tree and recovers brand/timescale/duration/
    // track count. DuckDB predicts every field from the synthesis
    // formulas, so a box-walk or endianness bug hash-mismatches.
    "q_video_meta" -> ((s, dir) => {
      import org.apache.spark.sql.Column
      def be32h(v: Column): Column = lpad(hex(v), 8, "0")
      val timescale = ((col("doc_id") % 4 + 1) * 600).cast("long")
      val duration = (coalesce(col("n_chars"), lit(0L)) * 100).cast("long")
      val nTracks = (col("doc_id") % 3 + 1).cast("int")
      val brandHex = when(col("doc_id") % 2 === 0, "69736F6D") // isom
        .otherwise("6D703432")                                 // mp42
      val ftypHex = concat(
        lit("00000010" + "66747970"), brandHex, lit("00000200"))
      val mvhdHex = concat(
        lit("0000006C" + "6D766864" + "00000000" + // v0, flags
          "00000000" + "00000000"),                // creation, modification
        be32h(timescale), be32h(duration),
        lit("00010000" + "01000000" +              // rate 1.0, volume, pad
          "0000000000000000" +                     // reserved
          "000100000000000000000000" +             // identity matrix (36 B)
          "000000000001000000000000" +
          "000000000000000040000000" +
          "000000000000000000000000" +             // pre_defined (24 B)
          "000000000000000000000000" +
          "00000003"))                             // next_track_id
      val trakHex = when(nTracks === 1, "000000087472616B")
        .when(nTracks === 2, "000000087472616B" * 2)
        .otherwise("000000087472616B" * 3)
      val moovHex = concat(
        be32h(lit(116L) + nTracks * 8), lit("6D6F6F76"), mvhdHex, trakHex)
      val media = Multimodal.asMedia(
        t(s, dir, "documents")
          .withColumn("media_type", lit("video"))
          .withColumn("payload", unhex(concat(ftypHex, moovHex))),
        "doc_id", "payload", "media_type", "source")
      Multimodal.videoMeta(media).toDF()
    }),

    // ORACLED pixel features: REAL byte path end to end — a 36x32
    // grayscale image per doc is synthesized from an integer formula,
    // encoded as an actual 24bpp BMP (bmpGray), decoded back by the real
    // BMP parser (bmpPixels), box-averaged and gradient-hashed (dHash).
    // DuckDB replays the formula -> floor-average -> bit-pack math and
    // never sees the bytes, so an encoder/decoder/hash defect anywhere in
    // the byte path hash-mismatches. 400 docs: the perceptual-dedup-key
    // shape, not a volume test.
    "q_image_dhash" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").filter(col("doc_id") <= 400)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          Multimodal.MediaRecord(id, "image",
            Multimodal.bmpGray(36, 32,
              (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt),
            "synth")
        })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
      Multimodal.imageDHash(media).toDF()
    }),

    // ORACLED compressed-codec pixel features: REAL codec path end to
    // end — a 36x32 RGB image per doc is synthesized from three integer
    // channel formulas, encoded as an actual PNG (javax.imageio),
    // decoded back by the real PNG reader, luminance-reduced and
    // dHashed. PNG is lossless, so DuckDB replays channel formulas ->
    // (r+g+b)//3 -> floor box averages -> gradient bits and never sees
    // the bytes; any defect in the encode/decode/reduce chain
    // hash-mismatches. Closes the documented compressed-codec stub
    // (JPEG stays out: lossy decode is not oracle-replayable).
    "q_png_dhash" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").filter(col("doc_id") <= 400)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          Multimodal.MediaRecord(id, "image",
            Multimodal.pngRgb(36, 32,
              (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt,
              (x, y) => ((id * 17 + x * 11 + y * 5) % 256).toInt,
              (x, y) => ((id * 23 + x * 3 + y * 19) % 256).toInt),
            "synth")
        })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
      Multimodal.pngDHash(media).toDF()
    }),

    // ORACLED PCM audio features: REAL byte path end to end — a mono
    // 16-bit sample stream per doc is synthesized from an integer
    // formula, encoded as an actual canonical WAV (wavPcm16), decoded
    // back by the real RIFF/PCM parser (wavPcm16Samples), and reduced to
    // exact-integer features (energy, peak, zero crossings). DuckDB
    // replays the formula and the aggregate math and never sees the
    // bytes, so an encoder/decoder/sign-extension defect anywhere in the
    // byte path hash-mismatches.
    "q_audio_pcm" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").filter(col("doc_id") <= 400)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = (200 + id % 57).toInt
          val samples = Array.tabulate(n) { i =>
            (((id * 37 + i * 101) % 2048) - 1024).toInt
          }
          Multimodal.MediaRecord(id, "audio",
            Multimodal.wavPcm16(1, 16000, samples), "synth")
        })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
      Multimodal.audioPcmFeatures(media).toDF()
    }),

    // ORACLED audio fingerprint: the multimodal near-dup key for audio —
    // same real byte path as q_audio_pcm, reduced to the energy-gradient
    // hash (33 windows -> 32 bits). DuckDB replays window assignment
    // (integer i*33//n), per-window energy sums, and the right>left bit
    // pack; the synthesis varies sample count AND a per-doc phase so
    // fingerprints differ across docs.
    "q_audio_fp" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").filter(col("doc_id") <= 400)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = (200 + id % 57).toInt
          val samples = Array.tabulate(n) { i =>
            (((id * 37 + i * 101) % 2048) - 1024).toInt
          }
          Multimodal.MediaRecord(id, "audio",
            Multimodal.wavPcm16(1, 16000, samples), "synth")
        })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
      Multimodal.audioFingerprints(media).toDF()
    }),

    // ORACLED frame sampling + per-frame hashes: a REAL multi-frame byte
    // path — 6 grayscale frames per doc are synthesized and encoded as a
    // concatenated-BMP container (each frame self-delimiting via its
    // LE32 size field), the real frame walk splits it back, every 2nd
    // frame is kept (the keyframe-stride sampler), and each kept frame
    // is pixel-decoded and dHashed. DuckDB replays formula -> floor
    // box averages -> bit pack per (doc, frame) and never sees the
    // bytes, so a frame-walk, decoder, or hash defect hash-mismatches.
    "q_video_frames" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").filter(col("doc_id") <= 400)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val frames = (0 until 6).map { f =>
            Multimodal.bmpGray(36, 32,
              (x, y) => ((id * 31 + f * 47 + x * 7 + y * 13) % 256).toInt)
          }
          Multimodal.MediaRecord(id, "video",
            frames.reduce(_ ++ _), "synth")
        })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
      Multimodal.videoFrameHashes(media, sampleEvery = 2).toDF()
    }),

    // ORACLED multimodal near-dup pairing, end to end: 200 base images
    // (id-dependent gradient directions so unrelated pairs land far
    // apart) + 200 near-copies (one 4x4 cell silenced — flips <= 2
    // gradient bits), hashed through the REAL encode->decode->dHash byte
    // path, then paired by the 8-byte-band candidate join + hamming
    // verify. DuckDB replays pixels, hashes, bands, and the xor bit
    // count; every (i, i+200) pair must surface with its exact hamming,
    // plus any structural near-collisions — both engines agree exactly.
    "q_dhash_neardup" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val b = id % 200
          val edited = id >= 200
          Multimodal.MediaRecord(id, "image",
            Multimodal.bmpGray(36, 32, (x, y) =>
              if (edited && x >= 12 && x < 16 && y >= 8 && y < 12) 0
              else ((b * 31 + x * (7 + b % 5) + y * (13 + b % 7)) % 256).toInt),
            "synth")
        })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
      Multimodal.dhashNearDupPairs(Multimodal.imageDHash(media))
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

    // WAV: the oracle predicts every parsed field from the synthesis
    // formulas; duration is floor((data*1000)/byteRate), integer // on
    // both sides.
    "q_audio_meta" ->
      """SELECT doc_id AS media_id,
           CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
           CAST((doc_id % 5 + 1) * 8000 AS INTEGER) AS sample_rate,
           CAST(16 AS INTEGER) AS bits_per_sample,
           CAST(coalesce(n_chars, 0) * 4 AS BIGINT) AS data_bytes,
           CAST((coalesce(n_chars, 0) * 4 * 1000) //
             ((doc_id % 5 + 1) * 8000 * (doc_id % 2 + 1) * 2) AS BIGINT)
             AS duration_ms
         FROM documents""",

    // MP4: every parsed field predicted from the synthesis formulas;
    // duration_ms is floor(duration*1000/timescale), integer // on both
    // sides.
    "q_video_meta" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
           CAST((doc_id % 4 + 1) * 600 AS BIGINT) AS timescale,
           CAST(coalesce(n_chars, 0) * 100 AS BIGINT) AS duration,
           CAST(doc_id % 3 + 1 AS INTEGER) AS n_tracks,
           CAST((coalesce(n_chars, 0) * 100 * 1000) //
             ((doc_id % 4 + 1) * 600) AS BIGINT) AS duration_ms
         FROM documents""",

    // dHash replay: same pixel formula, same floor box averages, same
    // right>left gradient bits, same 32-bit half packing (sums stay under
    // 2^32 so the BIGINT cast is exact; DuckDB's sum() would otherwise
    // come back HUGEINT->float and string-mismatch the hash).
    "q_image_dhash" ->
      """WITH ids AS (
           SELECT doc_id AS id FROM documents WHERE doc_id <= 400),
         cells AS (
           SELECT ids.id, r.r, c.c,
             (SELECT sum((ids.id*31 + (c.c*4 + dx.dx)*7
                          + (r.r*4 + dy.dy)*13) % 256)
              FROM generate_series(0,3) dx(dx),
                   generate_series(0,3) dy(dy)) // 16 AS g
           FROM ids, generate_series(0,7) r(r), generate_series(0,8) c(c)),
         bits AS (
           SELECT a.id, a.r, a.c,
             CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
           FROM cells a JOIN cells b
             ON b.id = a.id AND b.r = a.r AND b.c = a.c + 1
           WHERE a.c <= 7)
         SELECT id AS media_id,
           CAST(sum(CASE WHEN r < 4
             THEN bit * (CAST(1 AS BIGINT) << (31 - (r*8 + c)))
             ELSE 0 END) AS BIGINT) AS dhash_hi,
           CAST(sum(CASE WHEN r >= 4
             THEN bit * (CAST(1 AS BIGINT) << (31 - ((r-4)*8 + c)))
             ELSE 0 END) AS BIGINT) AS dhash_lo
         FROM bits GROUP BY id""",

    // PNG-dHash replay: per-pixel luminance = (r+g+b)//3 over the three
    // channel formulas, then the exact q_image_dhash cell/bit math. The
    // oracle never decodes PNG — losslessness is the bridge: Spark's
    // decoded channels ARE the formula values, or the hash mismatches.
    "q_png_dhash" ->
      """WITH ids AS (
           SELECT doc_id AS id FROM documents WHERE doc_id <= 400),
         cells AS (
           SELECT ids.id, r.r, c.c,
             (SELECT sum((
                 (ids.id*31 + (c.c*4 + dx.dx)*7 + (r.r*4 + dy.dy)*13) % 256
               + (ids.id*17 + (c.c*4 + dx.dx)*11 + (r.r*4 + dy.dy)*5) % 256
               + (ids.id*23 + (c.c*4 + dx.dx)*3 + (r.r*4 + dy.dy)*19) % 256
               ) // 3)
              FROM generate_series(0,3) dx(dx),
                   generate_series(0,3) dy(dy)) // 16 AS g
           FROM ids, generate_series(0,7) r(r), generate_series(0,8) c(c)),
         bits AS (
           SELECT a.id, a.r, a.c,
             CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
           FROM cells a JOIN cells b
             ON b.id = a.id AND b.r = a.r AND b.c = a.c + 1
           WHERE a.c <= 7)
         SELECT id AS media_id,
           CAST(sum(CASE WHEN r < 4
             THEN bit * (CAST(1 AS BIGINT) << (31 - (r*8 + c)))
             ELSE 0 END) AS BIGINT) AS dhash_hi,
           CAST(sum(CASE WHEN r >= 4
             THEN bit * (CAST(1 AS BIGINT) << (31 - ((r-4)*8 + c)))
             ELSE 0 END) AS BIGINT) AS dhash_lo
         FROM bits GROUP BY id""",

    // PCM replay: same sample formula, same integer aggregates; sums are
    // cast to BIGINT (DuckDB's sum() returns HUGEINT, which would
    // string-mismatch the hash). Zero crossings via lag() sign compare —
    // identical to the operator's adjacent-pair definition.
    "q_audio_pcm" ->
      """WITH ids AS (
           SELECT doc_id AS id FROM documents WHERE doc_id <= 400),
         samp AS (
           SELECT ids.id, i.i,
             ((ids.id*37 + i.i*101) % 2048) - 1024 AS s
           FROM ids, generate_series(0, 256) i(i)
           WHERE i.i < 200 + ids.id % 57),
         lagd AS (
           SELECT id, i, s,
             lag(s) OVER (PARTITION BY id ORDER BY i) AS prev
           FROM samp)
         SELECT id AS media_id,
           count(*) AS n_samples,
           CAST(sum(s) AS BIGINT) AS sum_amp,
           CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sum_sq,
           CAST(max(abs(s)) AS BIGINT) AS peak_abs,
           CAST(sum(CASE WHEN prev IS NOT NULL
                          AND ((prev < 0) <> (s < 0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
         FROM lagd GROUP BY id""",

    // Fingerprint replay: same sample formula, same i*33//n window
    // assignment, same energy sums and right>left bit pack. n >= 200 so
    // every one of the 33 windows is populated.
    "q_audio_fp" ->
      """WITH ids AS (
           SELECT doc_id AS id, 200 + doc_id % 57 AS n
           FROM documents WHERE doc_id <= 400),
         samp AS (
           SELECT ids.id, ids.n, i.i,
             ((ids.id*37 + i.i*101) % 2048) - 1024 AS s
           FROM ids, generate_series(0, 256) i(i)
           WHERE i.i < ids.n),
         en AS (
           SELECT id, (i*33) // n AS w,
             CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS e
           FROM samp GROUP BY id, (i*33) // n),
         bits AS (
           SELECT a.id, a.w,
             CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
           FROM en a JOIN en b ON b.id = a.id AND b.w = a.w + 1
           WHERE a.w <= 31)
         SELECT id AS media_id,
           CAST(sum(bit * (CAST(1 AS BIGINT) << (31 - w))) AS BIGINT) AS fp
         FROM bits GROUP BY id""",

    // Frame-hash replay: the q_image_dhash math with a frame dimension —
    // sampled frames 0/2/4 of 6, per-frame pixel formula offset by
    // f*47, same floor box averages and 32-bit half packing.
    "q_video_frames" ->
      """WITH ids AS (
           SELECT doc_id AS id FROM documents WHERE doc_id <= 400),
         frames AS (
           SELECT ids.id, f.f FROM ids, (VALUES (0), (2), (4)) f(f)),
         cells AS (
           SELECT fr.id, fr.f, r.r, c.c,
             (SELECT sum((fr.id*31 + fr.f*47 + (c.c*4 + dx.dx)*7
                          + (r.r*4 + dy.dy)*13) % 256)
              FROM generate_series(0,3) dx(dx),
                   generate_series(0,3) dy(dy)) // 16 AS g
           FROM frames fr, generate_series(0,7) r(r), generate_series(0,8) c(c)),
         bits AS (
           SELECT a.id, a.f, a.r, a.c,
             CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
           FROM cells a JOIN cells b
             ON b.id = a.id AND b.f = a.f AND b.r = a.r AND b.c = a.c + 1
           WHERE a.c <= 7)
         SELECT id AS media_id, CAST(f AS INTEGER) AS frame_idx,
           CAST(sum(CASE WHEN r < 4
             THEN bit * (CAST(1 AS BIGINT) << (31 - (r*8 + c)))
             ELSE 0 END) AS BIGINT) AS dhash_hi,
           CAST(sum(CASE WHEN r >= 4
             THEN bit * (CAST(1 AS BIGINT) << (31 - ((r-4)*8 + c)))
             ELSE 0 END) AS BIGINT) AS dhash_lo
         FROM bits GROUP BY id, f""",

    // Near-dup pairing replay: pixels (with the near-copy edit), dHash,
    // 8 byte-bands, DISTINCT same-band candidates, xor bit-count verify.
    // The operator's maxBucket cap cannot trigger here (400 ids < 1000),
    // so the oracle omits it. All 200 planted (i, i+200) pairs surface
    // (the edit flips <= 2 bits; banded recall is 1.0 for hamming <= 7)
    // plus the deterministic structural near-collisions.
    "q_dhash_neardup" ->
      """WITH ids AS (
           SELECT doc_id AS id, doc_id % 200 AS b, doc_id >= 200 AS edited
           FROM documents WHERE doc_id < 400),
         cells AS (
           SELECT ids.id, r.r, c.c,
             (SELECT sum(CASE WHEN ids.edited
                      AND (c.c*4 + dx.dx) BETWEEN 12 AND 15
                      AND (r.r*4 + dy.dy) BETWEEN 8 AND 11 THEN 0
                 ELSE (ids.b*31 + (c.c*4 + dx.dx)*(7 + ids.b%5)
                       + (r.r*4 + dy.dy)*(13 + ids.b%7)) % 256 END)
              FROM generate_series(0,3) dx(dx),
                   generate_series(0,3) dy(dy)) // 16 AS g
           FROM ids, generate_series(0,7) r(r), generate_series(0,8) c(c)),
         bits AS (
           SELECT a.id, a.r, a.c,
             CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
           FROM cells a JOIN cells b
             ON b.id = a.id AND b.r = a.r AND b.c = a.c + 1
           WHERE a.c <= 7),
         hashes AS (
           SELECT id AS media_id,
             CAST(sum(CASE WHEN r < 4
               THEN bit * (CAST(1 AS BIGINT) << (31 - (r*8 + c)))
               ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN r >= 4
               THEN bit * (CAST(1 AS BIGINT) << (31 - ((r-4)*8 + c)))
               ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY id),
         bands AS (
           SELECT media_id, hi, lo, k.k AS band,
             CASE WHEN k.k < 4 THEN (hi >> (24 - 8*k.k)) & 255
                  ELSE (lo >> (24 - 8*(k.k-4))) & 255 END AS bval
           FROM hashes, generate_series(0,7) k(k)),
         cand AS (
           SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
             a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
           FROM bands a JOIN bands b
             ON b.band = a.band AND b.bval = a.bval
             AND a.media_id < b.media_id)
         SELECT id_a, id_b,
           CAST(bit_count(xor(hi_a, hi_b))
             + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
         FROM cand
         WHERE bit_count(xor(hi_a, hi_b))
           + bit_count(xor(lo_a, lo_b)) <= 4""",
  )
}
