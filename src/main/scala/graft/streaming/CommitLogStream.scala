package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.engine.CommitLog

/** S9 streaming — the commit-log sink: after every microbatch, append
  * one row per (topic, partition) with the committed head offset and
  * counters — the rebuild of the reference's per-fetch `persistOffset`
  * HBase write (reference
  * `PartitionedSimpleConsumerKafkaInputDStream.scala:384-415`).
  *
  * Use with `writeStream.foreachBatch(sink.apply _)`. The per-batch
  * aggregate is one row per topic-partition — the same cardinality the
  * reference keeps as HBase rows — so the driver-side running-total map
  * and the collect() are bounded by partition count, not data volume
  * (at 100 TB/day this is still just one small row per partition per
  * trigger, appended to a (topic, partition)-partitioned parquet log).
  */
class CommitLogSink(spark: SparkSession, clientId: String, path: String)
    extends Serializable {

  // running `processed` totals — the HBase Increment twin (reference
  // `…InputDStream.scala:395-401`); keyed like the reference's rowkey.
  // Recovered from the existing log on (re)start, exactly as the
  // reference reads its counters back from HBase (`:178-196`).
  // Only "log does not exist yet" maps to empty totals; any OTHER
  // failure (a transient read error on a real filesystem) propagates —
  // swallowing it would silently reset the running counters to zero
  // and undercount forever after. Recovery is scoped to THIS client's
  // rows, as the reference's per-rowkey read is: two clients sharing a
  // log path must not cross-contaminate each other's totals.
  private lazy val totals: mutable.Map[(String, Int), Long] = {
    val recovered = mutable.Map.empty[(String, Int), Long]
    val p = new org.apache.hadoop.fs.Path(path)
    val exists =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (exists) {
      CommitLogStream.committedOffsets(spark, path, Some(clientId))
        .collect().foreach { r =>
          recovered((r.getString(0), r.getInt(1))) = r.getLong(3)
        }
    }
    recovered
  }

  def apply(batch: DataFrame, batchId: Long): Unit = {
    val commits = CommitLog.fromKafkaBatch(batch, clientId).collect()
    if (commits.isEmpty) return
    val withTotals = commits.map { r =>
      val key = (r.getString(1), r.getInt(2))
      val consumed = r.getLong(4)
      val total = totals.synchronized {
        val t = totals.getOrElse(key, 0L) + consumed
        totals(key) = t
        t
      }
      Row(r.getString(0), key._1, key._2, r.getLong(3), consumed, total,
        r.getString(6), r.getInt(7), r.getTimestamp(8))
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(withTotals.toIndexedSeq, 1),
        CommitLog.schema)
      .write.mode("append").partitionBy("topic", "partition").parquet(path)
  }
}

object CommitLogStream {

  /** S10 — offset recovery from the commit log: the last committed
    * offset per (topic, partition), what a restarting consumer seeds
    * from (reference `…InputDStream.scala:178-196`). The partitioned
    * log prunes the scan to the requested partitions' files.
    * `clientId = Some(id)` scopes recovery to one consumer's rows —
    * the per-rowkey read the reference does (`"[clientId]-…"` keys) —
    * so co-located clients never read each other's state.
    */
  def committedOffsets(spark: SparkSession, path: String,
                       clientId: Option[String] = None): DataFrame = {
    val log = spark.read.schema(CommitLog.schema).parquet(path)
    clientId.fold(log)(id => log.filter(col("client_id") === id))
      .groupBy(col("topic"), col("partition"))
      .agg(max(col("offset")).as("committed_offset"),
        max(col("processed")).as("processed"))
  }

  /** S10/S11 — the offset-seeding policy, the reference's recovery
    * branch verbatim (reference `…InputDStream.scala:207-211`): the
    * reference consults stored offsets ONLY when `!cleanOffsets`, so a
    * new consumer seeds each partition from
    *  - the broker head offset when `cleanOffsets &&
    *    startFromLatestOffset` (skip the backlog),
    *  - offset 0 (earliest) when `cleanOffsets` alone — a clean
    *    restart deliberately reprocesses the backlog and must NOT
    *    read the stale committed offsets,
    *  - else the committed offset from the log, defaulting to 0 for a
    *    partition never seen (`:179`, earliest).
    * `committed` = committedOffsets output; `heads` = per-partition
    * (topic, partition, head_offset).
    */
  def seedOffsets(cfg: graft.engine.KafkaShape.StreamConfig,
                  committed: DataFrame, heads: DataFrame): DataFrame = {
    if (cfg.cleanOffsets && cfg.startFromLatestOffset)
      heads.select(col("topic"), col("partition"),
        col("head_offset").as("seed_offset"))
    else if (cfg.cleanOffsets)
      heads.select(col("topic"), col("partition"),
        lit(0L).as("seed_offset"))
    else
      heads.join(committed, Seq("topic", "partition"), "left")
        .select(col("topic"), col("partition"),
          coalesce(col("committed_offset"), lit(0L)).as("seed_offset"))
  }

  /** Compaction: collapse the append-only log to its latest row per
    * (client, topic, partition) — the state HBase held as one
    * always-current row per rowkey. `processed` increases monotonically
    * per key, so max(struct(processed, …)) IS the latest row,
    * deterministically. One aggregation; run periodically so recovery
    * reads stay O(partitions) however long the stream has lived.
    */
  def compact(spark: SparkSession, logPath: String,
              snapshotPath: String): Unit =
    spark.read.schema(CommitLog.schema).parquet(logPath)
      .groupBy(col("client_id"), col("topic"), col("partition"))
      .agg(max(struct(col("processed"), col("offset"), col("consumed"),
        col("host"), col("status"), col("ts"))).as("m"))
      .select(col("client_id"), col("topic"), col("partition"),
        col("m.offset").as("offset"), col("m.consumed").as("consumed"),
        col("m.processed").as("processed"), col("m.host").as("host"),
        col("m.status").as("status"), col("m.ts").as("ts"))
      .write.mode("overwrite").partitionBy("topic", "partition")
      .parquet(snapshotPath)
}

/** X6 — StreamingQueryListener capturing per-batch progress and the
  * observed source metrics (StreamingPipelines.withSourceMetrics):
  * the rebuild of the reference's Gauge/Meter registration into
  * Spark's metrics system (reference `…InputDStream.scala:200,214-228`)
  * — same signals (head offset, consumption rate, health), exported
  * through the engine's own listener bus instead of a registry.
  */
final case class ProgressSnapshot(
    batchId: Long,
    numInputRows: Long,
    inputRowsPerSecond: Double,
    records: Option[Long],
    headOffset: Option[Long])

class GraftMetricsListener extends StreamingQueryListener {
  private val buf = new ConcurrentLinkedQueue[ProgressSnapshot]()

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val obs = Option(p.observedMetrics.get("graft_source"))
    buf.add(ProgressSnapshot(
      p.batchId,
      p.numInputRows,
      p.inputRowsPerSecond,
      obs.map(_.getAs[Long]("records")),
      obs.map(_.getAs[Long]("head_offset"))))
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def snapshots: Seq[ProgressSnapshot] = buf.iterator().asScala.toSeq
}
