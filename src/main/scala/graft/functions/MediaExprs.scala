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
