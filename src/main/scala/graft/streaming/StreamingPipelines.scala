package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.KafkaShape
import graft.ops.StreamOps

/** The streaming twins of the batch dataflow ops — the SAME operator
  * code (graft.ops.StreamOps / engine.KafkaShape) applied to a
  * streaming DataFrame, plus the watermark/state policies that only
  * exist in streaming.
  *
  * Correctness contract (exercised in graft.streaming test suites):
  * a streaming run over a finite input equals the batch run over the
  * same rows — Structured Streaming's state store is the incremental
  * twin of the reference's inverse-function window maintenance
  * (reference `examples/.../KafkaWordCount.scala:72`).
  */
object StreamingPipelines {

  /** A1 streaming — windowed word count over a Kafka-shaped stream.
    * Decode (P1/P2) → tokenize (P4) → event-time window aggregate, with
    * a watermark bounding state and dropping late data (the reference's
    * window never handled lateness — SURVEY §2 A1; this is the strict
    * upgrade). Identical expressions to the batch form: the call IS
    * StreamOps.wordCountWindow.
    */
  def wordCountStream(kafka: DataFrame,
                      windowDur: String = "10 minutes",
                      slide: Option[String] = None,
                      watermark: String = "1 minute"): DataFrame =
    StreamOps.wordCountWindow(
      KafkaShape.decodeUtf8(kafka).withWatermark("ts", watermark),
      windowDur, slide)

  /** X2/X3 semantics — exactly-once output from at-least-once input.
    *
    * The reference advances its offset cursor per message and persists
    * AFTER store (reference `…InputDStream.scala:304,310` vs `:320`),
    * so a crash between store and persist replays records: downstream
    * must tolerate duplicates keyed by (topic, partition, offset).
    * The streaming rebuild makes that tolerance explicit:
    * `dropDuplicatesWithinWatermark` on the record identity — state
    * bounded by the watermark instead of growing forever.
    */
  def exactlyOnceRecords(kafka: DataFrame,
                         watermark: String = "10 minutes"): DataFrame =
    kafka.withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark("topic", "partition", "offset")

  /** X6 — the metrics hook: per-microbatch record count and head
    * offset as observed metrics, the `observe()` twin of the
    * reference's per-partition Gauge/Meter registration (reference
    * `…InputDStream.scala:214-228`). Read back from
    * `StreamingQueryProgress.observedMetrics("graft_source")` by
    * CommitLogListener.
    */
  def withSourceMetrics(kafka: DataFrame): DataFrame =
    kafka.observe("graft_source",
      count(lit(1)).as("records"),
      max(col("offset")).as("head_offset"),
      approx_count_distinct(col("partition")).as("active_partitions"))
}
