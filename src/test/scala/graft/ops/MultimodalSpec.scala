package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables
import graft.functions.ImageHeaders

/** N5: the header decode is REAL byte parsing — assert it on
  * hand-crafted container bytes (including a JPEG whose SOF sits
  * behind APP0/DQT segments, which only a genuine marker scan can
  * find), then that the expression-form and mapPartitions-form decodes
  * agree row-for-row on the synthesized payloads, and that frame
  * slicing covers payloads without overlap.
  */
class MultimodalSpec extends SparkSuite {

  private def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("ImageHeaders parses PNG IHDR dimensions") {
    val png = hex("89504E470D0A1A0A 0000000D 49484452") ++
      hex("00000280") ++ hex("000001E0") ++ // 640 x 480
      hex("0806000000 00000000") ++ "pixels".getBytes
    assert(ImageHeaders.decode(png) == (640L, 480L, "png"))
  }

  test("ImageHeaders finds JPEG SOF behind APP0 and DQT segments") {
    // SOI, APP0 (JFIF, 16 bytes), DQT (5 byte stub), SOF0 1024x768
    val jpeg = hex("FFD8") ++
      hex("FFE0 0010 4A46494600 0101 00 0048 0048 00 00") ++
      hex("FFDB 0005 00 11 22") ++
      hex("FFC0 0011 08") ++ be16(768) ++ be16(1024) ++
      hex("03 011100 021101 031101") ++ "entropy".getBytes ++ hex("FFD9")
    assert(ImageHeaders.decode(jpeg) == (1024L, 768L, "jpeg"))
  }

  test("ImageHeaders parses progressive JPEG (SOF2) and GIF LE dims") {
    val sof2 = hex("FFD8 FFC2 0011 08") ++ be16(32) ++ be16(64) ++
      hex("03 011100 021101 031101")
    assert(ImageHeaders.decode(sof2) == (64L, 32L, "jpeg"))
    val gif = "GIF89a".getBytes ++
      Array(0x20.toByte, 0x01.toByte) ++ // 288 little-endian
      Array(0x40.toByte, 0x00.toByte) ++ // 64
      hex("000000 3B")
    assert(ImageHeaders.decode(gif) == (288L, 64L, "gif"))
  }

  test("ImageHeaders is conservative on garbage and truncation") {
    assert(ImageHeaders.decode(Array.empty[Byte]) == (0L, 0L, "bin"))
    assert(ImageHeaders.decode("plain text".getBytes) == (0L, 0L, "bin"))
    // PNG signature but truncated before IHDR dims
    assert(ImageHeaders.decode(hex("89504E470D0A1A0A 0000")) ==
      (0L, 0L, "bin"))
    // JPEG that ends (EOI) before any SOF
    assert(ImageHeaders.decode(hex("FFD8 FFD9")) == (0L, 0L, "bin"))
    // DQT declaring a length past the buffer
    assert(ImageHeaders.decode(hex("FFD8 FFDB FFFF 00")) == (0L, 0L, "bin"))
  }

  test("ImageHeaders parses TIFF IFDs in both byte orders; lying " +
      "offsets and counts return bin") {
    // LE: II*\0, IFD at 8, 2 entries: tag 256 LONG 800, tag 257
    // SHORT 600 (SHORT value in the FIRST two value bytes)
    val le = hex("49492A00 08000000 0200") ++
      hex("0001 0400 01000000 20030000") ++
      hex("0101 0300 01000000 58020000") ++
      hex("00000000") ++ "body".getBytes
    assert(ImageHeaders.decode(le) == (800L, 600L, "tiff"))
    // BE: MM\0*, same logical content in big-endian
    val be = hex("4D4D002A 00000008 0002") ++
      hex("0100 0004 00000001 00000320") ++
      hex("0101 0003 00000001 02580000") ++
      hex("00000000")
    assert(ImageHeaders.decode(be) == (800L, 600L, "tiff"))
    // IFD offset beyond the buffer → bin, no throw
    assert(ImageHeaders.decode(hex("49492A00 FFFFFF7F")) ==
      (0L, 0L, "bin"))
    // entry count larger than the remaining bytes → bin
    assert(ImageHeaders.decode(hex("49492A00 08000000 FF00 0001")) ==
      (0L, 0L, "bin"))
    // missing height tag → bin (conservative)
    val noH = hex("49492A00 08000000 0100") ++
      hex("0001 0400 01000000 20030000") ++ hex("00000000")
    assert(ImageHeaders.decode(noH) == (0L, 0L, "bin"))
  }

  test("synthesized TIFF payloads round-trip in both byte orders") {
    val s = spark
    import s.implicits._
    val docs = (0L to 9L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val got = Multimodal.decodeMeta(Multimodal.tiffPayload(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(5))).toMap
    (0L to 9L).foreach { i =>
      assert(got(i) == ((16 + i % 317, 16 + (i * 7) % 211, "tiff")),
        s"doc $i")
    }
  }

  test("ImageHeaders parses BMP dims, including top-down negative height") {
    // 'BM', size, reserved, offset 54, info size 40, 800 x 600 LE
    val bmp = hex("424D 00000000 00000000 36000000 28000000") ++
      hex("20030000") ++ hex("58020000") ++ // 800, 600 LE32
      hex("0100 1800") ++ Array.fill(24)(0.toByte) ++ "px".getBytes
    assert(ImageHeaders.decode(bmp) == (800L, 600L, "bmp"))
    // top-down: height stored as -600 two's complement
    val topDown = bmp.clone()
    hex("A8FDFFFF").copyToArray(topDown, 22)
    assert(ImageHeaders.decode(topDown) == (800L, 600L, "bmp"))
    // BITMAPCOREHEADER (info size 12) is NOT parsed — conservative
    val core = bmp.clone()
    hex("0C000000").copyToArray(core, 14)
    assert(ImageHeaders.decode(core) == (0L, 0L, "bin"))
  }

  test("ImageHeaders parses all three WebP chunk layouts") {
    def riff(chunk: Array[Byte]) =
      "RIFF".getBytes ++ hex("00000000") ++ "WEBP".getBytes ++ chunk
    // VP8X: LE24 minus-one dims → 320 x 240
    val vp8x = riff("VP8X".getBytes ++ hex("0A000000 00 000000") ++
      hex("3F0100") ++ hex("EF0000"))
    assert(ImageHeaders.decode(vp8x) == (320L, 240L, "webp"))
    // VP8L: 0x2F then 14+14 bits of (w-1, h-1): 17 x 9
    // bits = (17-1) | (9-1)<<14 = 16 + 8*16384 = 131088 = 0x00020010
    val vp8l = riff("VP8L".getBytes ++ hex("05000000") ++
      hex("2F 10000200"))
    assert(ImageHeaders.decode(vp8l) == (17L, 9L, "webp"))
    // lossy VP8 : 3-byte frame tag, sync 9D 01 2A, LE14 dims 50 x 40
    val vp8 = riff("VP8 ".getBytes ++ hex("0A000000") ++
      hex("000000 9D012A") ++ hex("3200") ++ hex("2800"))
    assert(ImageHeaders.decode(vp8) == (50L, 40L, "webp"))
    // RIFF/WAVE must NOT decode as an image
    val wave = "RIFF".getBytes ++ hex("00000000") ++ "WAVE".getBytes ++
      Array.fill(20)(0.toByte)
    assert(ImageHeaders.decode(wave) == (0L, 0L, "bin"))
    // truncated VP8X (dims cut off) is conservative
    assert(ImageHeaders.decode(vp8x.take(26)) == (0L, 0L, "bin"))
  }

  test("synthesized BMP/WebP payloads round-trip (incl. negative height)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Multimodal.decodeMeta(Multimodal.imagePayloadExt(docs))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(5)))
    assert(got.nonEmpty)
    got.foreach { case (id, w, h, fmt) =>
      assert(w == 16 + id % 317, s"doc $id width")
      assert(h == 16 + (id * 7) % 211, s"doc $id height")
      assert(fmt == (if (id % 2 == 0) "bmp" else "webp"), s"doc $id fmt")
    }
    // the negative-height encoding is actually exercised
    assert(got.exists(_._1 % 4 == 0))
  }

  test("AudioHeaders walks RIFF chunks to fmt and data") {
    import graft.functions.AudioHeaders
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val data = Array.fill[Byte](800)(0x11)
    // an extraneous LIST chunk (odd size, so word-aligned skip is
    // exercised) sits between fmt and data — a fixed-offset peek at
    // byte 36 would misparse this file
    val wav = "RIFF".getBytes ++ le32(4 + 24 + 11 + 8 + 800) ++
      "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      "LIST".getBytes ++ le32(3) ++ "abc".getBytes ++ Array(0.toByte) ++
      "data".getBytes ++ le32(800) ++ data
    assert(AudioHeaders.decode(wav) == (2L, 44100L, 16L, 200L, "wav"))
    // garbage / truncation / missing data chunk → conservative zeros
    assert(AudioHeaders.decode("not audio".getBytes)._5 == "bin")
    assert(AudioHeaders.decode("RIFF1234WAVE".getBytes)._5 == "bin")
    val nodata = "RIFF".getBytes ++ le32(28) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    assert(AudioHeaders.decode(nodata)._5 == "bin")
  }

  test("synthesized WAVs round-trip through the chunk-walk parser") {
    val metas = Multimodal.decodeAudioMeta(Multimodal.audioPayload(
      Tables.documents(spark, "/root/testdata/sf0.001")))
      .collect()
    assert(metas.nonEmpty)
    metas.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == 1L + id % 2L, s"channels doc $id")
      assert(r.getLong(3) == 8000L + (id * 13) % 40000L, s"rate doc $id")
      assert(r.getLong(4) == 16L && r.getString(6) == "wav")
    }
  }

  test("VideoHeaders walks nested MP4 boxes, v0 and v1, skipping free") {
    import graft.functions.VideoHeaders
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    val matrix = be32(0x10000L) ++ Array.fill[Byte](12)(0) ++
      be32(0x10000L) ++ Array.fill[Byte](12)(0) ++ be32(0x40000000L)
    // v1 mvhd (64-bit times/duration) + a free box BEFORE it in moov
    val mvhd1 = be32(120) ++ "mvhd".getBytes ++
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(600) ++ be64(3000) ++ // timescale 600, dur 3000 → 5000 ms
      be32(0x10000L) ++ Array[Byte](1, 0, 0, 0) ++
      Array.fill[Byte](8)(0) ++ matrix ++ Array.fill[Byte](24)(0) ++
      be32(0)
    val tkhd = be32(92) ++ "tkhd".getBytes ++ be32(7) ++
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(3000) ++
      Array.fill[Byte](8)(0) ++ Array.fill[Byte](8)(0) ++ matrix ++
      be32(1920L << 16) ++ be32(1080L << 16)
    val trak = be32(8 + tkhd.length) ++ "trak".getBytes ++ tkhd
    val free = be32(11) ++ "free".getBytes ++ "pad".getBytes
    val moovBody = free ++ mvhd1 ++ trak
    val moov = be32(8 + moovBody.length) ++ "moov".getBytes ++ moovBody
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    assert(VideoHeaders.decode(ftyp ++ moov) ==
      (5000L, 1920L, 1080L, "mp4"))
    // garbage, no moov, truncated moov → conservative bin
    assert(VideoHeaders.decode("not a video".getBytes)._4 == "bin")
    assert(VideoHeaders.decode(ftyp)._4 == "bin")
    assert(VideoHeaders.decode(ftyp ++ moov.take(20))._4 == "bin")
  }

  test("synthesized MP4s round-trip through the box-walk parser") {
    val metas = Multimodal.decodeVideoMeta(Multimodal.videoPayload(
      Tables.documents(spark, "/root/testdata/sf0.001")))
      .collect()
    assert(metas.nonEmpty)
    metas.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == (1L + id % 7200L) * 100L, s"duration doc $id")
      assert(r.getLong(3) == 160L + (id % 8) * 80L, s"width doc $id")
      assert(r.getLong(4) == 120L + (id % 6) * 60L, s"height doc $id")
      assert(r.getString(5) == "mp4")
    }
  }

  test("media parsers never throw on fuzzed bytes (random + mutated-valid)") {
    import graft.functions.{AudioHeaders, ImageHeaders, VideoHeaders}
    val rnd = new scala.util.Random(20260812L)
    def mutate(b: Array[Byte]): Array[Byte] = {
      val m = b.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      m.take(if (rnd.nextBoolean()) rnd.nextInt(m.length + 1) else m.length)
    }
    // seeds: every magic prefix the dispatchers route on, so mutations
    // explore the deep parser paths, not just the signature rejects
    val seeds = Seq[Array[Byte]](
      ImageHeaders.PngSig ++ Array.fill[Byte](40)(7),
      Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte) ++
        Array.fill[Byte](40)(1),
      "GIF89a".getBytes ++ Array.fill[Byte](12)(2),
      "RIFF1234WAVEfmt ".getBytes ++ Array.fill[Byte](40)(3),
      Array[Byte](0, 0, 0, 20) ++ "ftypisom".getBytes ++
        Array.fill[Byte](60)(4))
    val cases =
      Seq.fill(500)(Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt(256).toByte)) ++
        seeds.flatMap(s => Seq.fill(200)(mutate(s)))
    cases.foreach { bytes =>
      ImageHeaders.decode(bytes) // must not throw
      AudioHeaders.decode(bytes)
      VideoHeaders.decode(bytes)
    }
  }

  test("mediaCatalog dispatches every blob to its modality by magic bytes") {
    val cat = Multimodal.mediaCatalog(
      Tables.documents(spark, "/root/testdata/sf0.001")).collect()
    assert(cat.nonEmpty)
    cat.foreach { r =>
      val id = r.getLong(0)
      val want = (id % 3) match {
        case 0 => ("image", "jpeg"); case 1 => ("audio", "wav")
        case _ => ("video", "mp4")
      }
      assert((r.getString(2), r.getString(3)) == want, s"doc $id")
    }
    // and a non-media blob lands in 'unknown' instead of failing
    val s = spark
    import s.implicits._
    val junk = Multimodal.detectAndDecode(
      Seq((99L, "just some text".getBytes)).toDF("doc_id", "payload"))
      .collect().head
    assert(junk.getString(2) == "unknown" && junk.getString(3) == "bin")
  }

  test("synthesized payloads round-trip: parse(synthesize(w,h)) == (w,h)") {
    val metas = Multimodal.decodeMeta(Multimodal.imagePayload(
      Tables.documents(spark, "/root/testdata/sf0.001")))
      .collect()
    assert(metas.nonEmpty)
    metas.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == 16L + id % 317L, s"width mismatch doc $id")
      assert(r.getLong(3) == 16L + (id * 7) % 211L, s"height doc $id")
      val want = (id % 3) match {
        case 0 => "jpeg"; case 1 => "png"; case _ => "gif"
      }
      assert(r.getString(5) == want, s"fmt mismatch doc $id")
    }
  }

  test("decodeMeta equals decodePartition on synthesized payloads") {
    val payload = Multimodal.imagePayload(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "byte_len", "width", "height", "n_frames", "fmt")
        .collect().map(_.toSeq).toSet
    assert(rows(Multimodal.decodeMeta(payload)) ==
      rows(Multimodal.decodePartition(spark, payload).toDF()))
  }

  test("media decode composes with the streaming engine end to end") {
    // mixed media blobs ride the Kafka frame's `value` column through
    // the graft-ocf store, stream back, and dispatch-decode per
    // microbatch — the catalog scan as a continuous pipeline
    val s = spark
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = tmpDir("ocf_media_stream")
    val m = pmod(col("doc_id"), lit(3))
    Multimodal.imagePayload(docs.filter(m === 0))
      .unionByName(Multimodal.audioPayload(docs.filter(m === 1)))
      .unionByName(Multimodal.videoPayload(docs.filter(m === 2)))
      .select(
        col("doc_id").cast("string").cast("binary").as("key"),
        col("payload").as("value"),
        lit("media").as("topic"),
        pmod(col("doc_id"), lit(4)).cast("int").as("partition"),
        col("doc_id").as("offset"),
        lit(java.sql.Timestamp.valueOf("2026-01-01 10:00:00"))
          .as("timestamp"),
        lit(0).as("timestampType"))
      .write.format("graft-ocf").mode("overwrite").save(dir)
    val q = Multimodal.detectAndDecode(
        s.readStream.format("graft-ocf")
          .option("maxRecordsPerTrigger", "200").load(dir)
          .select(col("offset").as("doc_id"), col("value").as("payload")))
      .writeStream.format("memory").queryName("media_stream")
      .option("checkpointLocation", tmpDir("ocf_media_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("media_stream")
      .groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Multimodal.mediaCatalog(docs)
      .groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch && streamed.values.sum == docs.count(),
      s"stream $streamed != batch $batch")
  }

  test("frame sampling covers every payload byte except the tail") {
    val payload = Multimodal.withPayload(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val frames = Multimodal.frameSample(payload)
    val bad = frames.groupBy("doc_id", "byte_len")
      .agg(sum("frame_len").as("covered"), count(lit(1)).as("n"))
      // n_frames * stride <= byte_len and coverage = n * stride except
      // the final partial frame; assert coverage never exceeds payload
      .filter(col("covered") > col("byte_len")).count()
    assert(bad == 0L, "frames may not overlap past the payload")
  }
}
