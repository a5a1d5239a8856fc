package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N5 — multimodal columns: media carried as opaque `binary` payloads
  * with typed metadata structs, flowing through relational operators
  * unchanged.
  *
  * Media codecs don't exist in this environment, so the decode kernel
  * is a clearly-marked deterministic STUB (both `decodeMeta` and the
  * `decodePartition` body): metadata is derived purely from payload
  * length, which makes the whole pipeline oracle-checkable while
  * keeping the Spark-side plumbing — binary schema, batched
  * per-partition decode, metadata struct shape — real.
  * Swapping in a JNI/FFI image decoder changes only the body of
  * `decodePartition`.
  */
object Multimodal {

  /** Typed metadata a real image decoder would emit. */
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                       height: Long, n_frames: Long, fmt: String)

  /** Attach a binary payload column (here: utf-8 bytes of `text`; in
    * production: the image/audio blob read from object storage).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

  /** Column-expression form of the stub decode — codegen-friendly,
    * used by the oracle-checked query.
    */
  def decodeMeta(payload: DataFrame): DataFrame =
    payload.select(
      col("doc_id"),
      length(col("payload")).cast(LongType).as("byte_len"))
      .select(
        col("doc_id"), col("byte_len"),
        (lit(320L) + pmod(col("byte_len"), lit(320L))).as("width"),
        (lit(240L) + pmod(col("byte_len") * 7L, lit(240L))).as("height"),
        (lit(1L) + pmod(col("byte_len"), lit(30L))).as("n_frames"),
        when(pmod(col("byte_len"), lit(3L)) === 0, lit("jpeg"))
          .when(pmod(col("byte_len"), lit(3L)) === 1, lit("png"))
          .otherwise(lit("webp")).as("fmt"))

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

  /** Per-partition batched decode — the shape a real codec needs
    * (amortized init per partition, bytes in / struct out). STUB body:
    * must produce exactly decodeMeta's values; a real decoder would
    * parse `payload` here.
    */
  def decodePartition(spark: SparkSession,
                      payload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() once per partition
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          MediaMeta(id, n, 320L + n % 320L, 240L + (n * 7L) % 240L,
            1L + n % 30L,
            (n % 3L) match {
              case 0L => "jpeg"
              case 1L => "png"
              case _ => "webp"
            })
        }
      }
  }
}
