package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The canonical Kafka record contract and the local facade that produces
  * it from the `events` table (SURVEY.md §1.3, §7 step 2).
  *
  * The reference engine's element type is a stream of (key, value) byte
  * records tagged with (topic, partition, offset)
  * (reference `PartitionedSimpleConsumerKafkaInputDStream.scala:51`,
  * `KafkaUtils.scala:207-228`). Structured Streaming's Kafka source
  * exposes exactly this as a 7-column DataFrame; we standardize on that
  * schema so every downstream operator is written once against the
  * contract and runs unchanged against a real `format("kafka")` source.
  */
object KafkaShape {

  /** Schema identical to spark-sql-kafka's source output. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Default partition count of the simulated topic. The reference shards
    * partitions across consumers with `partition % consumersCount`
    * (reference `…InputDStream.scala:104-106`); 8 partitions give that
    * predicate something to bite on in tests.
    */
  val defaultNumPartitions = 8

  /** Stream configuration — rebuild of the reference's
    * `KafkaStreamConsumerConfig` (reference `…InputDStream.scala:28-43`).
    * ZK/HBase/socket knobs disappear (Structured Streaming owns
    * connectivity and checkpointing); what survives is the query-visible
    * surface: identity, sharding, topics and offset-recovery policy.
    */
  final case class StreamConfig(
      consumerId: Int = 0,
      consumersCount: Int = 1,
      clientId: String = "graft",
      topics: Seq[String] = Seq("events"),
      numPartitions: Int = defaultNumPartitions,
      startFromLatestOffset: Boolean = false,
      cleanOffsets: Boolean = false,
      devMode: Boolean = false)

  /** Map the `events` table onto the Kafka record contract:
    * key = user id bytes, value = props payload bytes, offset = event id,
    * partition = shard of the key (FIXTURES.md "Stream-shaped table").
    * Sign-preserving `%` (not pmod) so the shard matches the DuckDB
    * oracles' `user_id % n` for ALL inputs, not just the fixture's
    * non-negative ids; real Kafka partitions are non-negative, where
    * the two agree.
    */
  def fromEvents(events: DataFrame,
                 numPartitions: Int = defaultNumPartitions,
                 topic: String = "events"): DataFrame =
    events.select(
      col("user_id").cast(StringType).cast(BinaryType).as("key"),
      col("props").cast(BinaryType).as("value"),
      lit(topic).as("topic"),
      (col("user_id") % numPartitions.toLong).cast(IntegerType)
        .as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))

  /** S1 multi-topic — the reference consumes a SET of topics in one
    * stream (reference `README.md:6-11`; ZK walk over the subscription
    * list at `KafkaUtils.scala:94-116`; `StreamConfig.topics`). The
    * local facade simulates that by deriving the topic from the
    * event_type column — each event type becomes its own topic
    * `events_<type>` — and keeping only the subscribed set, exactly
    * the subscription semantics: records on unsubscribed topics are
    * never fetched. Offsets stay per-(topic, partition) monotone
    * because event_id is globally increasing in the fixture.
    */
  def fromEventsByType(events: DataFrame,
                       topics: Seq[String],
                       numPartitions: Int = defaultNumPartitions): DataFrame =
    events.select(
      col("user_id").cast(StringType).cast(BinaryType).as("key"),
      col("props").cast(BinaryType).as("value"),
      concat(lit("events_"), col("event_type")).as("topic"),
      (col("user_id") % numPartitions.toLong).cast(IntegerType)
        .as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))
      .filter(col("topic").isin(topics: _*))

  /** P1/P2 — the default UTF-8 record decode: the reference's
    * `messagesFlatMapper` default is `bytes => Seq(new String(bytes,
    * "utf8"))` with a nullable key decoded the same way (reference
    * `…InputDStream.scala:50,61,305-310`).
    */
  def decodeUtf8(kafka: DataFrame): DataFrame =
    kafka.select(
      col("key").cast(StringType).as("key_str"),
      col("value").cast(StringType).as("value_str"),
      col("topic"),
      col("partition").cast(LongType).as("kpartition"),
      col("offset").as("koffset"),
      col("timestamp").as("ts"))

  /** P6 — modulo shard filter: this consumer instance owns a partition
    * iff `partition % consumersCount == consumerId` (reference
    * `…InputDStream.scala:104-106`). On a cluster Spark's own task
    * scheduling replaces this, but the predicate stays correctness-
    * testable and prunes at the scan when partition is a file-partition
    * column.
    */
  def shardFilter(cfg: StreamConfig): Column =
    pmod(col("partition"), lit(cfg.consumersCount)) === lit(cfg.consumerId)
}
