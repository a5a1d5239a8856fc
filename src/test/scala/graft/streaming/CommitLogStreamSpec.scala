package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}

import graft.{RocksDBStateStore, SparkSuite}

/** S9/S10/X6 streaming: the foreachBatch commit-log sink appends one
  * row per (topic, partition) per microbatch with accumulating
  * `processed` totals; recovery reads return the committed head
  * offsets; the listener captures per-batch observed source metrics.
  */
class CommitLogStreamSpec extends SparkSuite with RocksDBStateStore {

  private def rec(userId: Long, offset: Long, sec: Int): KafkaRecord =
    KafkaRecord.ofEvent(userId, s"p$offset", offset,
      new Timestamp(Timestamp.valueOf("2026-01-01 10:00:00").getTime +
        sec * 1000L), numPartitions = 4)

  test("X6 batch twin: Observation collects source metrics in one pass") {
    val s = spark
    import s.implicits._
    val kafka = s.createDataset((0 until 25).map(i => rec(i % 4, i, i)))
      .toDF()
    val (obs, df) = StreamingPipelines.observeBatch(kafka)
    assert(df.count() == 25)
    val m = obs.get
    assert(m("records") == 25L && m("head_offset") == 24L)
  }

  test("S11 seeding policy: latest vs committed vs earliest-default") {
    val s = spark
    import s.implicits._
    val heads = Seq(("events", 0, 100L), ("events", 1, 200L),
      ("events", 2, 300L))
      .toDF("topic", "partition", "head_offset")
    // partition 2 has no committed offset → defaults to 0 (earliest)
    val committed = Seq(("events", 0, 40L, 40L), ("events", 1, 150L, 150L))
      .toDF("topic", "partition", "committed_offset", "processed")
    import graft.engine.KafkaShape.StreamConfig
    def seeds(cfg: StreamConfig) =
      CommitLogStream.seedOffsets(cfg, committed, heads)
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(seeds(StreamConfig()) == Map(0 -> 40L, 1 -> 150L, 2 -> 0L),
      "default: committed, else earliest (reference :179,207-211)")
    assert(seeds(StreamConfig(cleanOffsets = true,
      startFromLatestOffset = true)) ==
      Map(0 -> 100L, 1 -> 200L, 2 -> 300L),
      "cleanOffsets + startFromLatest: broker heads")
    assert(seeds(StreamConfig(startFromLatestOffset = true)) ==
      Map(0 -> 40L, 1 -> 150L, 2 -> 0L),
      "startFromLatest without cleanOffsets stays on committed")
    assert(seeds(StreamConfig(cleanOffsets = true)) ==
      Map(0 -> 0L, 1 -> 0L, 2 -> 0L),
      "cleanOffsets alone seeds earliest — a clean restart reprocesses " +
        "the backlog and must NOT read stored offsets (reference " +
        "`…InputDStream.scala:207-211`: store read only when !cleanOffsets)")
  }

  test("commit-log sink + offset recovery + metrics listener") {
    val s = spark
    val logPath = tmpDir("commit_log")
    val sink = new CommitLogSink(s, "graft-test", logPath)
    val listener = new GraftMetricsListener
    s.streams.addListener(listener)
    try {
      val (input, kafkaStream) = KafkaShapedStream.memory(s)
      val q = StreamingPipelines.withSourceMetrics(kafkaStream)
        .writeStream
        .foreachBatch((df: DataFrame, id: Long) => sink.apply(df, id))
        .option("checkpointLocation", tmpDir("cl_ckpt"))
        .start()

      // batch 1: offsets 0..39 across partitions 0..3 (userId 0..3)
      input.addData((0 until 40).map(i => rec(i % 4, i, i)))
      q.processAllAvailable()
      // batch 2: offsets 40..59
      input.addData((40 until 60).map(i => rec(i % 4, i, i)))
      q.processAllAvailable()
      q.stop()

      val log = s.read.schema(graft.engine.CommitLog.schema).parquet(logPath)
      val perPart = log.groupBy("partition").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(perPart.keySet == Set(0, 1, 2, 3))
      assert(perPart.values.forall(_ == 2L),
        s"one commit row per partition per batch, got $perPart")

      // processed accumulates across batches (HBase Increment twin)
      val processed = log.groupBy("partition")
        .agg(org.apache.spark.sql.functions.max("processed").as("p"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(processed.values.forall(_ == 15L),
        s"each partition saw 10 + 5 records, got $processed")

      // S10 recovery: committed head offset per partition
      val committed = CommitLogStream.committedOffsets(s, logPath)
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
      assert(committed == Map(0 -> 56L, 1 -> 57L, 2 -> 58L, 3 -> 59L),
        s"got $committed")

      // X6: listener captured per-batch observed metrics (async bus —
      // poll briefly)
      val deadline = System.currentTimeMillis() + 10000
      while (listener.snapshots.count(_.records.nonEmpty) < 2 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val snaps = listener.snapshots.filter(_.records.nonEmpty)
      assert(snaps.map(_.records.get).sum == 60L,
        s"observed record counts should sum to 60: $snaps")
      assert(snaps.map(_.headOffset.get).max == 59L)

      // S9 restart recovery: a NEW sink instance on the same log picks
      // the processed counters back up (the HBase read-back twin)
      val sink2 = new CommitLogSink(s, "graft-test", logPath)
      val (input2, kafka2) = KafkaShapedStream.memory(s)
      val q2 = kafka2.writeStream
        .foreachBatch((df: DataFrame, id: Long) => sink2.apply(df, id))
        .option("checkpointLocation", tmpDir("cl_ckpt2"))
        .start()
      input2.addData((60 until 80).map(i => rec(i % 4, i, i)))
      q2.processAllAvailable()
      q2.stop()
      val processed2 = s.read.schema(graft.engine.CommitLog.schema)
        .parquet(logPath).groupBy("partition")
        .agg(org.apache.spark.sql.functions.max("processed").as("p"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(processed2.values.forall(_ == 20L),
        s"15 before restart + 5 after, got $processed2")

      // S9 compaction: the multi-batch log collapses to one current
      // row per partition carrying the final counters
      val snapPath = tmpDir("commit_snapshot")
      CommitLogStream.compact(s, logPath, snapPath)
      val snap = s.read.parquet(snapPath)
        .selectExpr("cast(partition as int) p", "cast(offset as long) o",
          "cast(processed as long) pr")
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(snap.keySet == Set(0, 1, 2, 3))
      assert(snap.forall { case (p, (off, proc)) =>
        off == 76L + p && proc == 20L }, s"got $snap")

      // M3 end-to-end: the lag report over a LIVE head (offsets up to
      // 99 now exist upstream) vs the offsets this sink committed —
      // the full ProcessorMetrics program wired to real commit state
      val head = {
        import s.implicits._
        (0 until 100).map(i => (i % 4, i.toLong))
          .toDF("p", "offset")
          .selectExpr("cast(null as binary) as key",
            "cast('x' as binary) as value", "'events' as topic",
            "cast(p as int) as partition", "offset",
            "timestamp'2026-01-01' as timestamp", "0 as timestampType")
      }
      val lag = graft.engine.Monitoring.lagReport(head,
          CommitLogStream.committedOffsets(s, logPath)
            .withColumnRenamed("committed_offset", "offset"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      // head per partition p: max offset ≡ 96+p; committed after the
      // restarted sink's batch: 76+p → lag 20 everywhere
      assert(lag == Map(0L -> 20L, 1L -> 20L, 2L -> 20L, 3L -> 20L),
        s"got $lag")
    } finally s.streams.removeListener(listener)
  }
}
