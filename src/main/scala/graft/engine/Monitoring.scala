package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's batch monitoring program, rebuilt as relational
  * queries (reference `ProcessorMetrics.scala:21-101`).
  */
object Monitoring {

  /** M2 — group-by-leader request batching: one OffsetRequest per broker
    * serving all its partitions (reference `ProcessorMetrics.scala:34-48`,
    * `partitionLeaders.groupBy(_._2).flatMap{…}`). Leader assignment is
    * simulated deterministically (partition % brokers). Output is one row
    * per leader with its sorted partition list — a plain hash aggregation;
    * at scale this is exactly the map-side-combined groupBy Spark
    * already does.
    */
  def leaderBatches(kafka: DataFrame, numBrokers: Int = 3): DataFrame =
    kafka.select(col("partition").cast(LongType).as("kpartition"))
      .distinct()
      .withColumn("leader", pmod(col("kpartition"), lit(numBrokers.toLong)))
      .groupBy(col("leader"))
      .agg(
        count(lit(1)).as("n_partitions"),
        array_join(array_sort(collect_set(col("kpartition"))), ",")
          .as("partitions"))

  /** S9↔M3 round-trip — rowkey reverse-parse: the reference's
    * monitoring program does not receive (topic, partition) — it
    * recovers them FROM the rowkey string (partition =
    * `split("-").reverse.head`, reference `ProcessorMetrics.scala:79`;
    * rowkey layout `"[clientId]-topic-partition"` at
    * `…InputDStream.scala:393`). This is that direction: parse
    * client/topic/partition back out of the rowkey (topic-safe even
    * when the topic itself contains dashes) and join the parsed
    * partitions against the live head offsets — the full
    * HBase-row → lag-report path. Both sides are per-partition
    * aggregates, so the join touches O(partitions) rows.
    */
  def rowkeyParse(commits: DataFrame, kafka: DataFrame): DataFrame = {
    val parsed = commits.select(
      col("rowkey"),
      regexp_extract(col("rowkey"), "^\\[([^\\]]*)\\]", 1)
        .as("parsed_client"),
      regexp_extract(col("rowkey"), "^\\[[^\\]]*\\]-(.*)-[0-9]+$", 1)
        .as("parsed_topic"),
      element_at(split(col("rowkey"), "-"), -1).cast(LongType)
        .as("kpartition"),
      col("offset").as("committed_offset"))
    // heads are per (topic, partition): joining on the partition alone
    // would compute lag against the cross-topic max head offset when
    // the frame carries multiple topics (fromEventsByType)
    val heads = kafka
      .groupBy(col("topic").as("head_topic"),
        col("partition").cast(LongType).as("hpartition"))
      .agg(max(col("offset")).as("head_offset"))
    parsed.join(heads,
        parsed("parsed_topic") === heads("head_topic") &&
          parsed("kpartition") === heads("hpartition"))
      .select(col("rowkey"), col("parsed_client"), col("parsed_topic"),
        col("kpartition"), col("head_offset"), col("committed_offset"),
        (col("head_offset") - col("committed_offset")).as("lag"))
  }

  /** M3 — the lag join, flagship monitoring query: per partition,
    * (latest Kafka head offset) full-outer-join (committed offset), with
    * -1 for a missing side and lag = head - committed (reference
    * `ProcessorMetrics.scala:21-101`: kafka side `:34-66`, HBase multi-get
    * side `:68-84`, zip with -1 defaults `:86-89`).
    *
    * Both sides are partition-keyed aggregates, so the join shuffles two
    * tiny pre-aggregated relations, never the raw stream. On a real
    * deployment `commits` is the commit-log parquet pruned to one
    * (topic, partition) directory per key.
    */
  def lagReport(kafka: DataFrame, commits: DataFrame): DataFrame = {
    val heads = kafka
      .groupBy(col("partition").cast(LongType).as("kpartition"))
      .agg(max(col("offset")).as("head_offset"))
    val committed = commits
      .select(col("partition").cast(LongType).as("kpartition"),
        col("offset").as("committed_offset"))
    heads.join(committed, Seq("kpartition"), "full_outer")
      .select(
        col("kpartition"),
        coalesce(col("head_offset"), lit(-1L)).as("head_offset"),
        coalesce(col("committed_offset"), lit(-1L)).as("committed_offset"))
      .withColumn("lag",
        when(col("head_offset") >= 0 && col("committed_offset") >= 0,
          col("head_offset") - col("committed_offset")).otherwise(lit(-1L)))
  }
}
