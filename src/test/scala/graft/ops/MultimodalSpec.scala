package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables

/** N5: the expression-form and mapPartitions-form decodes must agree
  * row-for-row (same stub arithmetic, two execution shapes), and frame
  * slicing must cover the payload without overlap for stride-aligned
  * docs.
  */
class MultimodalSpec extends SparkSuite {

  test("decodeMeta equals decodePartition on sf0.001 documents") {
    val payload = Multimodal.withPayload(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "byte_len", "width", "height", "n_frames", "fmt")
        .collect().map(_.toSeq).toSet
    assert(rows(Multimodal.decodeMeta(payload)) ==
      rows(Multimodal.decodePartition(spark, payload).toDF()))
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
