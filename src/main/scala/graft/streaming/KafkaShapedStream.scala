package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** One record of the canonical Kafka source contract
  * (graft.engine.KafkaShape.schema) as a case class, so a
  * `MemoryStream[KafkaRecord]` produces a streaming DataFrame with
  * exactly the columns a real `format("kafka")` source would — swap the
  * source and every downstream operator runs unchanged.
  *
  * This is the rebuild of the reference's raw message tuple
  * `(offset, nextOffset, key: Option[Array[Byte]], value: Array[Byte])`
  * (reference `KafkaUtils.scala:163,207-228`) tagged with its
  * (topic, partition) identity (reference
  * `PartitionedSimpleConsumerKafkaInputDStream.scala:96-98`).
  */
final case class KafkaRecord(
    key: Array[Byte],
    value: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: Timestamp,
    timestampType: Int)

object KafkaRecord {
  implicit val encoder: Encoder[KafkaRecord] = Encoders.product[KafkaRecord]

  /** Build a record the way KafkaShape.fromEvents shapes the events
    * table: key = user id bytes, value = payload bytes, offset =
    * event id, partition = user_id mod numPartitions.
    */
  def ofEvent(userId: Long, props: String, eventId: Long, ts: Timestamp,
              numPartitions: Int = 8, topic: String = "events"): KafkaRecord =
    KafkaRecord(
      key = userId.toString.getBytes("UTF-8"),
      value = props.getBytes("UTF-8"),
      topic = topic,
      partition = (userId % numPartitions).toInt,
      offset = eventId,
      timestamp = ts,
      timestampType = 0)
}

/** S1/S2 streaming — the Kafka-shaped streaming source factory.
  *
  * The reference's entry point is
  * `SparkUtils.createStreamPartition(ssc, cfg, flatMapper)` returning a
  * receiver-backed DStream (reference `SparkUtils.scala:18-20`). The
  * Structured Streaming rebuild returns a streaming DataFrame in the
  * same 7-column contract; locally it is `MemoryStream`-backed (no
  * broker in this environment), in production the builder would be
  * `spark.readStream.format("kafka")` with the same downstream code.
  */
object KafkaShapedStream {

  /** A MemoryStream feeding a Kafka-shaped streaming DataFrame.
    * Returns (input handle, streaming DF): push records with
    * `input.addData(...)`, the DF has KafkaShape.schema columns.
    */
  def memory(spark: SparkSession): (MemoryStream[KafkaRecord], DataFrame) = {
    val input = MemoryStream[KafkaRecord](KafkaRecord.encoder, spark)
    (input, input.toDF())
  }

  /** S2 — the one-call factory, `createStreamPartition`'s twin: build
    * this consumer instance's stream from its config — the source
    * filtered to the partitions the consumer owns (P6 shard predicate;
    * the reference filters discovered partitions the same way at
    * registration, `…InputDStream.scala:269-270`).
    */
  def forConfig(spark: SparkSession,
                cfg: graft.engine.KafkaShape.StreamConfig)
      : (MemoryStream[KafkaRecord], DataFrame) = {
    val (input, df) = memory(spark)
    (input, df.filter(graft.engine.KafkaShape.shardFilter(cfg)))
  }
}
