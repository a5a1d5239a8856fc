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
