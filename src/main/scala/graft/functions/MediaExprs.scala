package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-level image-header parsing for the multimodal pipeline
  * (N5): no codec library, just the container byte layout — exactly
  * what a 100 TB metadata-extraction scan needs, since dimensions and
  * format live in the first few hundred bytes of every mainstream
  * container and decoding pixels to learn the width would be the
  * canonical scale mistake.
  *
  * Formats:
  *  - PNG: 8-byte signature, then the IHDR chunk — width/height are
  *    big-endian u32 at offsets 16/20.
  *  - JPEG: SOI then a marker scan to the first SOF frame header
  *    (C0-C3, C5-C7, C9-CB, CD-CF): height/width are big-endian u16 at
  *    +5/+7 of the marker; APPn/DQT/etc are skipped by their declared
  *    length, so metadata-bearing prefixes parse correctly.
  *  - GIF: "GIF87a"/"GIF89a", then the logical-screen size as
  *    little-endian u16 at offsets 6/8.
  * Anything else (or any truncated/corrupt header) decodes
  * conservatively to (0, 0, "bin") — never an exception.
  */
object ImageHeaders {

  final val PngSig: Array[Byte] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d,
    0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Long =
    ((u8(b, i) << 8) | u8(b, i + 1)).toLong
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8)).toLong
  private def le24(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong
  private def le32s(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3) << 24)

  /** (width, height, fmt); (0, 0, "bin") when not a parseable image. */
  def decode(b: Array[Byte]): (Long, Long, String) = {
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      (be32(b, 16), be32(b, 20), "png")
    else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
      decodeJpeg(b)
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      (le16(b, 6), le16(b, 8), "gif")
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' &&
        le32s(b, 14) >= 40) {
      // BITMAPINFOHEADER: LE i32 dims at 18/22; negative height is
      // the top-down row order flag, magnitude is the pixel height
      val w = le32s(b, 18).toLong
      val h = math.abs(le32s(b, 22).toLong)
      if (w > 0 && h > 0) (w, h, "bmp") else (0L, 0L, "bin")
    }
    else if (b.length >= 25 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P')
      decodeWebp(b)
    else if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 0x2a &&
          u8(b, 3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 &&
          u8(b, 3) == 0x2a)))
      decodeTiff(b)
    else (0L, 0L, "bin")
  }

  /** TIFF: "II*\0" (LE) or "MM\0*" (BE) magic, u32 offset to the
    * first IFD, then (entry count, 12-byte entries). Dims are tags
    * 256/257, inline value for SHORT (type 3, first 2 value bytes in
    * file byte order) or LONG (type 4). Every offset bounds-checked
    * as Long before narrowing — truncated or lying files return bin.
    */
  private def decodeTiff(b: Array[Byte]): (Long, Long, String) = {
    val le = b(0) == 'I'
    def u16at(i: Int): Long = if (le) le16(b, i) else be16(b, i)
    def u32at(i: Int): Long =
      if (le) le32s(b, i).toLong & 0xffffffffL else be32(b, i)
    val ifd = u32at(4)
    if (ifd < 8L || ifd + 2L > b.length) return (0L, 0L, "bin")
    val n = u16at(ifd.toInt).toInt
    if (ifd + 2L + 12L * n > b.length) return (0L, 0L, "bin")
    var w = 0L
    var h = 0L
    var k = 0
    while (k < n) {
      val off = ifd.toInt + 2 + 12 * k
      val tag = u16at(off)
      val typ = u16at(off + 2)
      val cnt = u32at(off + 4)
      if ((tag == 256L || tag == 257L) && cnt == 1L) {
        val v =
          if (typ == 3L) u16at(off + 8)
          else if (typ == 4L) u32at(off + 8)
          else -1L
        if (v > 0L) { if (tag == 256L) w = v else h = v }
      }
      k += 1
    }
    if (w > 0L && h > 0L) (w, h, "tiff") else (0L, 0L, "bin")
  }

  /** WebP: RIFF container already matched; dispatch on the first
    * chunk. VP8X (extended): LE24 width-1/height-1 at 24/27. VP8L
    * (lossless): 14-bit packed dims after the 0x2F signature. "VP8 "
    * (lossy): 14-bit LE dims after the 9D 01 2A sync code.
    */
  private def decodeWebp(b: Array[Byte]): (Long, Long, String) = {
    if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'X' &&
        b.length >= 30)
      (1L + le24(b, 24), 1L + le24(b, 27), "webp")
    else if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
        b(15) == 'L' && b.length >= 25 && u8(b, 20) == 0x2f) {
      val bits = le32s(b, 21).toLong & 0xffffffffL
      (1L + (bits & 0x3fff), 1L + ((bits >> 14) & 0x3fff), "webp")
    }
    else if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
        b(15) == ' ' && b.length >= 30 && u8(b, 23) == 0x9d &&
        u8(b, 24) == 0x01 && u8(b, 25) == 0x2a)
      (le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff, "webp")
    else (0L, 0L, "bin")
  }

  private def decodeJpeg(b: Array[Byte]): (Long, Long, String) = {
    var p = 2
    while (p + 3 < b.length) {
      if (u8(b, p) != 0xff) return (0L, 0L, "bin")
      val m = u8(b, p + 1)
      if (m == 0xff) { p += 1 } // fill byte before a marker
      else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) { p += 2 } // bare
      else if (m == 0xd9 || m == 0xda) return (0L, 0L, "bin") // no SOF
      else {
        val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 &&
          m != 0xcc
        if (isSof) {
          if (p + 8 >= b.length) return (0L, 0L, "bin")
          return (be16(b, p + 7), be16(b, p + 5), "jpeg")
        }
        val len = be16(b, p + 2).toInt
        if (len < 2) return (0L, 0L, "bin")
        p += 2 + len
      }
    }
    (0L, 0L, "bin")
  }

  /** The expression kernel: one InternalRow (width, height, fmt). */
  def decodeRow(b: Array[Byte]): InternalRow = {
    val (w, h, f) = decode(b)
    new GenericInternalRow(Array[Any](w, h, UTF8String.fromString(f)))
  }
}

/** Real RIFF/WAVE header parsing — the audio face of N5. A genuine
  * chunk walk (not a fixed-offset peek): RIFF magic, then chunks of
  * (4-byte id, little-endian u32 size) until `fmt ` (channels, sample
  * rate, bits/sample) and `data` (payload size → sample count) are
  * both seen. Non-WAV or truncated input decodes to all-zeros with
  * fmt "bin" — never an exception. Like ImageHeaders, this is the
  * metadata a 100 TB audio scan needs without a codec: everything
  * lives in the first chunk headers.
  */
object AudioHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8)).toLong
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** (channels, sampleRate, bitsPerSample, nSamples, fmt);
    * zeros + "bin" when not parseable WAV.
    */
  def decode(b: Array[Byte]): (Long, Long, Long, Long, String) = {
    val none = (0L, 0L, 0L, 0L, "bin")
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return none
    var p = 12
    var channels = 0L; var rate = 0L; var bits = 0L
    var blockAlign = 0L; var dataLen = -1L
    while (p + 8 <= b.length && (channels == 0L || dataLen < 0L)) {
      val size = le32(b, p + 4)
      // a declared chunk size near u32-max would wrap the cursor —
      // treat as corrupt rather than loop
      if (size > Int.MaxValue - 16) return none
      if (tag(b, p, "fmt ") && p + 8 + 16 <= b.length) {
        channels = le16(b, p + 10)
        rate = le32(b, p + 12)
        blockAlign = le16(b, p + 20)
        bits = le16(b, p + 22)
      } else if (tag(b, p, "data")) {
        // size may overstate a truncated payload: clamp to real bytes
        dataLen = math.min(size, (b.length - p - 8).toLong)
      }
      p += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0L || rate <= 0L || blockAlign <= 0L || dataLen < 0L)
      none
    else (channels, rate, bits, dataLen / blockAlign, "wav")
  }

  def decodeRow(b: Array[Byte]): InternalRow = {
    val (c, r, bits, n, f) = decode(b)
    new GenericInternalRow(Array[Any](c, r, bits, n,
      UTF8String.fromString(f)))
  }
}

/** Real ISO-BMFF (MP4) box parsing — the video face of N5. A genuine
  * nested box walk: top-level boxes of (u32 big-endian size, 4cc type)
  * until `moov`, then inside it `mvhd` (timescale, duration — version
  * 0 and 1 layouts both handled) and `trak`/`tkhd` (track width and
  * height, 16.16 fixed point). Unknown boxes (`free`, `udta`, …) are
  * skipped by size at every level, exactly as a real demuxer walks a
  * file. Non-MP4 or truncated input decodes to zeros with fmt "bin".
  */
object VideoHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Long =
    ((u8(b, i) << 8) | u8(b, i + 1)).toLong
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** Find a box by 4cc within [from, until); returns (payloadStart,
    * payloadEnd) or null. Skips unknown boxes by declared size;
    * size==1 (64-bit largesize) and size==0 (to-end) are handled.
    */
  private def findBox(b: Array[Byte], from: Int, until: Int,
                      name: String): (Int, Int) = {
    var p = from
    while (p + 8 <= until) {
      var size = be32(b, p)
      var hdr = 8
      if (size == 1L && p + 16 <= until) { size = be64(b, p + 8); hdr = 16 }
      else if (size == 0L) size = (until - p).toLong
      if (size < hdr || p + size > until) return null
      if (tag(b, p + 4, name)) return (p + hdr, p + size.toInt)
      p += size.toInt
    }
    null
  }

  /** (durationMs, width, height, fmt); zeros + "bin" if not MP4. */
  def decode(b: Array[Byte]): (Long, Long, Long, String) = {
    val none = (0L, 0L, 0L, "bin")
    if (b.length < 12 || !tag(b, 4, "ftyp")) return none
    val moov = findBox(b, 0, b.length, "moov")
    if (moov == null) return none
    val mvhd = findBox(b, moov._1, moov._2, "mvhd")
    if (mvhd == null) return none
    val (p, end) = mvhd
    if (p + 4 > end) return none
    val v = u8(b, p)
    // v0: ctime/mtime u32 → timescale at +12, duration u32 at +16
    // v1: ctime/mtime u64 → timescale at +20, duration u64 at +24
    val (ts, dur) =
      if (v == 0 && p + 20 <= end) (be32(b, p + 12), be32(b, p + 16))
      else if (v == 1 && p + 32 <= end) (be32(b, p + 20), be64(b, p + 24))
      else return none
    if (ts <= 0) return none
    val durMs = dur * 1000L / ts
    // first trak's tkhd carries the visual track size (16.16 fixed)
    val trak = findBox(b, moov._1, moov._2, "trak")
    val (w, h) =
      if (trak == null) (0L, 0L)
      else {
        val tkhd = findBox(b, trak._1, trak._2, "tkhd")
        if (tkhd == null) (0L, 0L)
        else {
          val (q, qend) = tkhd
          val tv = u8(b, q)
          // width/height sit after version-dependent times + fixed
          // fields: v0 at +76/+80, v1 at +88/+92 of the payload
          val off = if (tv == 1) 88 else 76
          if (q + off + 8 <= qend)
            (be32(b, q + off) >> 16, be32(b, q + off + 4) >> 16)
          else (0L, 0L)
        }
      }
    (durMs, w, h, "mp4")
  }

  def decodeRow(b: Array[Byte]): InternalRow = {
    val (d, w, h, f) = decode(b)
    new GenericInternalRow(Array[Any](d, w, h, UTF8String.fromString(f)))
  }
}

/** binary → struct<duration_ms, width, height, fmt>. */
case class VideoHeaderDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("fmt", StringType, nullable = false)))
  override def prettyName: String = "graft_video_header"

  override protected def nullSafeEval(input: Any): Any =
    VideoHeaders.decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = VideoHeaders.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.decodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : VideoHeaderDecode = copy(child = newChild)
}

/** binary → struct<channels, sample_rate, bits, n_samples, fmt>. */
case class AudioHeaderDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("channels", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("bits", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("fmt", StringType, nullable = false)))
  override def prettyName: String = "graft_audio_header"

  override protected def nullSafeEval(input: Any): Any =
    AudioHeaders.decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = AudioHeaders.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.decodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AudioHeaderDecode = copy(child = newChild)
}

/** binary → struct<width: bigint, height: bigint, fmt: string>, one
  * static-call codegen kernel per row (stays inside whole-stage
  * codegen; no Scala UDF serialization).
  */
case class ImageHeaderDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("fmt", StringType, nullable = false)))
  override def prettyName: String = "graft_image_header"

  override protected def nullSafeEval(input: Any): Any =
    ImageHeaders.decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = ImageHeaders.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.decodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ImageHeaderDecode = copy(child = newChild)
}
