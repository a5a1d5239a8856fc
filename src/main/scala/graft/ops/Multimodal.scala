package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N5 — multimodal columns: media carried as opaque `binary` payloads
  * with typed metadata structs, flowing through relational operators
  * unchanged.
  *
  * Metadata decode is REAL byte-level container parsing
  * (graft.functions.ImageHeaders): PNG IHDR, a JPEG SOF marker scan,
  * and the GIF logical-screen descriptor — dimensions and format are
  * read out of actual header bytes, no codec library needed. What this
  * environment cannot provide is real image FILES, so `imagePayload`
  * synthesizes structurally VALID headers (dimensions derived from
  * doc_id, document text as the byte tail) — the oracle then checks
  * the genuine round trip parse(synthesize(w, h)) == (w, h) on every
  * row. Pixel decode (the part that does need a codec) stays out of
  * scope; a JNI/FFI decoder would slot into `decodePartition`'s
  * per-partition batch loop unchanged.
  */
object Multimodal {

  /** Typed metadata a real image decoder would emit. */
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                       height: Long, n_frames: Long, fmt: String)

  /** Attach a binary payload column (here: utf-8 bytes of `text`; in
    * production: the image/audio blob read from object storage). Used
    * by the format-agnostic byte operators (frame sampling, byte
    * histograms).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

  /** Synthesize a structurally valid image payload per document —
    * JPEG / PNG / GIF round-robin by doc_id, dimensions derived from
    * doc_id, the document text as the (opaque) byte tail:
    *  - PNG: signature + IHDR chunk (big-endian u32 dims, fake CRC)
    *  - JPEG: SOI + a real SOF0 frame header (big-endian u16 dims,
    *    3 components) + EOI trailer
    *  - GIF: GIF89a + logical-screen descriptor (little-endian u16)
    * Everything downstream parses these with the same code that would
    * parse real files.
    */
  private def hx(s: String) = unhex(lit(s))
  private def be32(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 8, "0"))
  private def be16(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 4, "0"))
  private def le16(c: org.apache.spark.sql.Column) = {
    val x = lpad(hex(c), 4, "0")
    unhex(concat(substring(x, 3, 2), substring(x, 1, 2)))
  }
  private def le32(c: org.apache.spark.sql.Column) = {
    val x = lpad(hex(c), 8, "0")
    unhex(concat(substring(x, 7, 2), substring(x, 5, 2),
      substring(x, 3, 2), substring(x, 1, 2)))
  }

  def imagePayload(docs: DataFrame): DataFrame = {
    val w = lit(16L) + pmod(col("doc_id"), lit(317L))
    val h = lit(16L) + pmod(col("doc_id") * 7L, lit(211L))
    val body = col("text").cast(BinaryType)
    val png = concat(hx("89504E470D0A1A0A0000000D49484452"),
      be32(w), be32(h), hx("080600000000000000"), body)
    val jpeg = concat(hx("FFD8FFC0001108"), be16(h), be16(w),
      hx("03011100021101031101"), body, hx("FFD9"))
    val gif = concat(hx("474946383961"), le16(w), le16(h), hx("000000"),
      body, hx("3B"))
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, jpeg)
        .when(pmod(col("doc_id"), lit(3)) === 1, png)
        .otherwise(gif).as("payload"))
  }

  private def le24(c: org.apache.spark.sql.Column) = {
    val x = lpad(hex(c), 6, "0")
    unhex(concat(substring(x, 5, 2), substring(x, 3, 2),
      substring(x, 1, 2)))
  }

  /** The second image-format family: structurally valid BMP
    * (BITMAPINFOHEADER, even doc_ids — including the top-down
    * NEGATIVE-height encoding every 4th doc, which parsers that
    * naively read height as unsigned get wrong) and WebP VP8X
    * (RIFF container, LE24 minus-one dims, odd doc_ids). Same dim
    * formulas as [[imagePayload]] so the oracles share them.
    */
  def imagePayloadExt(docs: DataFrame): DataFrame = {
    val w = lit(16L) + pmod(col("doc_id"), lit(317L))
    val h = lit(16L) + pmod(col("doc_id") * 7L, lit(211L))
    val body = col("text").cast(BinaryType)
    // 54-byte header: BM, file size, reserved, data offset 54,
    // info size 40, dims, planes 1, 24 bpp, then 24 zero bytes
    val hSigned = when(pmod(col("doc_id"), lit(4)) === 0,
      lit(4294967296L) - h).otherwise(h) // LE32 two's-complement -h
    val bmp = concat(hx("424D"), le32(lit(54L) + length(body)),
      hx("00000000"), le32(lit(54L)), le32(lit(40L)), le32(w),
      le32(hSigned), hx("01001800"),
      hx("000000000000000000000000000000000000000000000000"), body)
    // RIFF size = "WEBP"(4) + chunk header(8) + VP8X payload(10) + body
    val webp = concat(hx("52494646"),
      le32(lit(22L) + length(body)), hx("57454250"),
      hx("56503858"), le32(lit(10L)), hx("00000000"),
      le24(w - 1L), le24(h - 1L), body)
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, bmp)
        .otherwise(webp).as("payload"))
  }

  /** Synthesize structurally valid TIFFs — little-endian ("II*\0",
    * even doc_ids) and BIG-endian ("MM\0*", odd doc_ids; the byte
    * order a naive LE-only parser gets wrong): magic, IFD offset 8,
    * a 2-entry IFD carrying LONG tags 256/257 (width/height), zero
    * next-IFD pointer, then the document text as body. 38 header
    * bytes in both byte orders; same dim formulas as
    * [[imagePayload]] so the oracles share them.
    */
  def tiffPayload(docs: DataFrame): DataFrame = {
    val w = lit(16L) + pmod(col("doc_id"), lit(317L))
    val h = lit(16L) + pmod(col("doc_id") * 7L, lit(211L))
    val body = col("text").cast(BinaryType)
    val tiffLe = concat(hx("49492A00"), le32(lit(8L)), hx("0200"),
      hx("0001"), hx("0400"), hx("01000000"), le32(w),
      hx("0101"), hx("0400"), hx("01000000"), le32(h),
      hx("00000000"), body)
    val tiffBe = concat(hx("4D4D002A"), be32(lit(8L)), hx("0002"),
      hx("0100"), hx("0004"), hx("00000001"), be32(w),
      hx("0101"), hx("0004"), hx("00000001"), be32(h),
      hx("00000000"), body)
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, tiffLe)
        .otherwise(tiffBe).as("payload"))
  }

  /** Synthesize a structurally valid PCM WAV payload per document —
    * RIFF/WAVE with a real `fmt ` chunk (channels and sample rate
    * derived from doc_id, 16-bit PCM) and the document text as the
    * `data` chunk. Parsed downstream by the same AudioHeaders chunk
    * walk that would parse real files.
    */
  def audioPayload(docs: DataFrame): DataFrame = {
    val channels = lit(1L) + pmod(col("doc_id"), lit(2L))
    val rate = lit(8000L) + pmod(col("doc_id") * 13L, lit(40000L))
    val blockAlign = channels * 2L // 16-bit PCM
    val body = col("text").cast(BinaryType)
    val tlen = length(body).cast(LongType)
    docs.select(col("doc_id"), concat(
      lit("RIFF").cast(BinaryType), le32(tlen + 36L),
      lit("WAVE").cast(BinaryType),
      lit("fmt ").cast(BinaryType), le32(lit(16L)),
      le16(lit(1L)),           // PCM
      le16(channels), le32(rate),
      le32(rate * blockAlign), // byte rate
      le16(blockAlign), le16(lit(16L)),
      lit("data").cast(BinaryType), le32(tlen), body).as("payload"))
  }

  /** Column-expression audio decode (AudioHeaderDecode kernel). */
  def decodeAudioMeta(payload: DataFrame): DataFrame =
    payload.select(
      col("doc_id"),
      length(col("payload")).cast(LongType).as("byte_len"),
      graft.functions.GraftFunctions.audioHeader(col("payload")).as("m"))
      .select(col("doc_id"), col("byte_len"),
        col("m.channels").as("channels"),
        col("m.sample_rate").as("sample_rate"),
        col("m.bits").as("bits"),
        col("m.n_samples").as("n_samples"),
        col("m.fmt").as("fmt"))

  /** Synthesize a structurally valid MP4 per document — ftyp, a moov
    * with a real mvhd (timescale 90000, duration derived from doc_id)
    * and one trak/tkhd carrying the visual size in 16.16 fixed point,
    * then the document text as the mdat payload. Parsed downstream by
    * the same VideoHeaders box walk that would parse real files.
    */
  def videoPayload(docs: DataFrame): DataFrame = {
    val w = lit(160L) + pmod(col("doc_id"), lit(8L)) * 80L
    val h = lit(120L) + pmod(col("doc_id"), lit(6L)) * 60L
    // duration ticks divisible by 90 → duration_ms is exact:
    // (1 + doc_id % 7200) * 9000 ticks @90kHz = (1 + doc_id % 7200)*100 ms
    val dur = (lit(1L) + pmod(col("doc_id"), lit(7200L))) * 9000L
    val body = col("text").cast(BinaryType)
    val tlen = length(body).cast(LongType)
    // unity display matrix: 9 big-endian u32 (16.16 / 2.30 fixed)
    val matrix = "00010000" + "00000000" * 3 + "00010000" +
      "00000000" * 3 + "40000000"
    val ftyp = hx("000000146674797069736F6D0000000069736F6D")
    val mvhd = concat(
      hx("0000006C6D766864" + "00000000" + "00000000" + "00000000" +
        "00015F90"),                       // version/times/timescale 90k
      be32(dur),
      hx("00010000" + "01000000" + "0000000000000000" + matrix +
        "0".repeat(48) + "00000000"))      // rate/volume/matrix/next-id
    val tkhd = concat(
      hx("000000647472616B" + "0000005C746B6864" + "00000007" +
        "00000000" + "00000000" + "00000001" + "00000000"),
      be32(dur),
      hx("0000000000000000" + "0000000000000000" + matrix),
      be32(w * 65536L), be32(h * 65536L))
    docs.select(col("doc_id"), concat(
      ftyp,
      hx("000000D86D6F6F76"), mvhd, tkhd,  // moov = mvhd(108)+trak(100)
      be32(tlen + 8L), hx("6D646174"), body).as("payload"))
  }

  /** Column-expression video decode (VideoHeaderDecode kernel). */
  def decodeVideoMeta(payload: DataFrame): DataFrame =
    payload.select(
      col("doc_id"),
      length(col("payload")).cast(LongType).as("byte_len"),
      graft.functions.GraftFunctions.videoHeader(col("payload")).as("m"))
      .select(col("doc_id"), col("byte_len"),
        col("m.duration_ms").as("duration_ms"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.fmt").as("fmt"))

  /** Column-expression decode — the ImageHeaderDecode codegen kernel
    * parses width/height/format out of the payload's header bytes.
    * n_frames = 1: still-image containers (a video frame counter
    * belongs to the codec layer).
    */
  def decodeMeta(payload: DataFrame): DataFrame =
    payload.select(
      col("doc_id"),
      length(col("payload")).cast(LongType).as("byte_len"),
      graft.functions.GraftFunctions.imageHeader(col("payload")).as("m"))
      .select(
        col("doc_id"), col("byte_len"),
        col("m.width").as("width"), col("m.height").as("height"),
        lit(1L).as("n_frames"), col("m.fmt").as("fmt"))

  /** Resize planning: the target dimensions a resize kernel would
    * produce fitting each medium into a `target`×`target` box while
    * preserving aspect ratio — pure integer arithmetic on the decoded
    * metadata (the kernel itself is the codec stub's concern).
    */
  def resizeDims(meta: DataFrame, target: Long = 224L): DataFrame =
    meta.select(
      col("doc_id"), col("width"), col("height"),
      when(col("width") >= col("height"), lit(target))
        .otherwise(floor(col("width") * target / col("height"))
          .cast(LongType)).as("out_w"),
      when(col("width") >= col("height"),
        floor(col("height") * target / col("width")).cast(LongType))
        .otherwise(lit(target)).as("out_h"))

  /** Frame sampling: deterministic byte-slice "frames" of the payload —
    * one output row per sampled frame with its index, length and
    * content fingerprint. The slicing arithmetic (n_frames from the
    * stub metadata, stride = len/n_frames) is the real plumbing a
    * video frame-sampler needs: binary slicing, per-frame rows,
    * bounded fan-out. Fingerprint = PolyHash31 of the frame bytes
    * (payloads are UTF-8 here, so the string hash IS the byte hash —
    * the fixture is ASCII, asserted by the oracle's parity).
    */
  def frameSample(payload: DataFrame): DataFrame = {
    val n = length(col("payload")).cast(LongType)
    val nFrames = lit(1L) + pmod(n, lit(30L))
    val stride = greatest(lit(1L), (n / nFrames).cast(LongType))
    payload
      .select(col("doc_id"), col("payload"), n.as("byte_len"),
        nFrames.as("n_frames"), stride.as("stride"))
      .select(col("doc_id"), col("byte_len"),
        posexplode(expr(
          "transform(sequence(0, n_frames - 1), " +
            "i -> substring(payload, cast(i * stride + 1 as int), " +
            "cast(stride as int)))")))
      .select(col("doc_id"), col("byte_len"),
        col("pos").cast(LongType).as("frame_idx"),
        length(col("col")).cast(LongType).as("frame_len"),
        graft.functions.GraftFunctions.polyHash(
          col("col").cast(StringType), graft.ops.TextOps.FpMod)
          .as("frame_fp"))
  }

  /** Feature extraction: bag-of-bytes histogram (ByteHistogram codegen
    * kernel) exploded to (doc_id, bucket, cnt) rows — the relational
    * shape an embedding-ish media featurizer feeds downstream.
    */
  def byteHistogram(payload: DataFrame, nBuckets: Int = 16): DataFrame =
    payload
      .select(col("doc_id"), posexplode(
        graft.functions.GraftFunctions.byteHistogram(col("payload"),
          nBuckets)))
      .select(col("doc_id"), col("pos").cast(LongType).as("bucket"),
        col("col").as("cnt"))

  /** Format dispatch over a mixed-modality corpus: every payload runs
    * all three header probes (each is a bounded peek at the first
    * bytes — cheap, and all inside one codegen stage) and the first
    * non-"bin" verdict wins. Magic bytes are disjoint across the
    * families (PNG/JPEG/GIF vs RIFF vs ftyp), so the dispatch is
    * unambiguous. Unknown blobs come out kind='unknown' rather than
    * failing — the crawl-bucket reality where media scans meet
    * arbitrary bytes.
    */
  def detectAndDecode(payload: DataFrame): DataFrame = {
    val f = graft.functions.GraftFunctions
    payload.select(col("doc_id"),
        length(col("payload")).cast(LongType).as("byte_len"),
        f.imageHeader(col("payload")).as("i"),
        f.audioHeader(col("payload")).as("a"),
        f.videoHeader(col("payload")).as("v"))
      .select(col("doc_id"), col("byte_len"),
        when(col("i.fmt") =!= "bin", lit("image"))
          .when(col("a.fmt") =!= "bin", lit("audio"))
          .when(col("v.fmt") =!= "bin", lit("video"))
          .otherwise(lit("unknown")).as("kind"),
        when(col("i.fmt") =!= "bin", col("i.fmt"))
          .when(col("a.fmt") =!= "bin", col("a.fmt"))
          .when(col("v.fmt") =!= "bin", col("v.fmt"))
          .otherwise(lit("bin")).as("fmt"),
        when(col("i.fmt") =!= "bin", col("i.width"))
          .when(col("a.fmt") =!= "bin", col("a.sample_rate"))
          .otherwise(col("v.width")).as("dim1"),
        when(col("i.fmt") =!= "bin", col("i.height"))
          .when(col("a.fmt") =!= "bin", col("a.channels"))
          .otherwise(col("v.height")).as("dim2"))
  }

  /** A mixed media corpus (one modality per doc by doc_id mod 3) run
    * through the magic-byte dispatch — the end-to-end catalog scan.
    */
  def mediaCatalog(docs: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(3))
    detectAndDecode(
      imagePayload(docs.filter(m === 0))
        .unionByName(audioPayload(docs.filter(m === 1)))
        .unionByName(videoPayload(docs.filter(m === 2))))
  }

  /** Per-partition batched decode — the shape a real codec needs
    * (amortized init per partition, bytes in / struct out), parsing the
    * same header bytes as the expression form through the shared
    * ImageHeaders kernel. A pixel decoder (JNI/FFI) would open its
    * context once per partition here.
    */
  def decodePartition(spark: SparkSession,
                      payload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pixel impl: val codec = Codec.open() once per partition
        it.map { case (id, bytes) =>
          val (w, h, fmt) = graft.functions.ImageHeaders.decode(bytes)
          MediaMeta(id, bytes.length.toLong, w, h, 1L, fmt)
        }
      }
  }
}
