package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S9/S10 + A2 — the offset/monitoring commit log.
  *
  * The reference persists, per (clientId, topic, partition), the consumed
  * offset plus health columns into an HBase row after every fetch
  * (reference `PartitionedSimpleConsumerKafkaInputDStream.scala:384-415`,
  * rowkey `"[clientId]-topic-partition"` at `:393`; read back for
  * recovery at `:178-196`). The rebuild is a queryable append-only
  * DataFrame with the same columns — written per microbatch by
  * graft.streaming.CommitLogSink (recovery read:
  * CommitLogStream.committedOffsets, exercised in CommitLogStreamSpec)
  * and derivable from any Kafka-shaped batch, partitioned by
  * (topic, partition) so 100 TB of log prunes to one partition's files
  * on recovery reads.
  */
object CommitLog {

  val schema: StructType = StructType(Seq(
    StructField("client_id", StringType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),       // last committed (exclusive next read)
    StructField("consumed", LongType),     // records in the last commit batch
    StructField("processed", LongType),    // running total (HBase Increment twin)
    StructField("host", StringType),
    StructField("status", IntegerType),    // last Kafka error code, 0 = healthy
    StructField("ts", TimestampType)))

  /** The reference's HBase rowkey format, kept as a derived column so the
    * rowkey-parsing query in ProcessorMetrics has a faithful twin
    * (reference `…InputDStream.scala:393`, `ProcessorMetrics.scala:70,79`).
    */
  def rowkey(clientId: String): org.apache.spark.sql.Column =
    concat_ws("-", lit(s"[$clientId]"), col("topic"), col("partition"))

  /** Derive commit-log state from a Kafka-shaped batch: one row per
    * (topic, partition) holding the head offset and counters — what the
    * reference's `persistOffset` leaves in HBase after draining the
    * topic. `committedFilter` simulates a consumer that has only
    * committed part of the stream (for lag queries).
    */
  def fromKafkaBatch(kafka: DataFrame,
                     clientId: String = "graft",
                     committedFilter: org.apache.spark.sql.Column = lit(true)): DataFrame =
    kafka.filter(committedFilter)
      .groupBy(col("topic"), col("partition"))
      .agg(
        max(col("offset")).as("offset"),
        count(lit(1)).as("consumed"),
        count(lit(1)).as("processed"),
        max(col("timestamp")).as("ts"))
      .select(
        lit(clientId).as("client_id"),
        col("topic"),
        col("partition"),
        col("offset"),
        col("consumed"),
        col("processed"),
        lit("localhost").as("host"),
        lit(0).as("status"),
        col("ts"))
}
