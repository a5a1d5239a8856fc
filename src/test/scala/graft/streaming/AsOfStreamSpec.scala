package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.AsOf
import graft.streaming.AsOfStream.TaggedEvent

/** Streaming as-of enrichment: equals the batch AsOf.asofJoin over the
  * same in-order finite input, and the carry state survives microbatch
  * boundaries (a build row in batch 1 enriches a probe in batch 2).
  */
class AsOfStreamSpec extends SparkSuite {

  // clicks (side 0) and purchases (side 1) for a handful of users,
  // including: same-ts tie between two clicks, click==purchase ts
  // (inclusive boundary), a probe-before-any-build user, and a
  // build-only user that must emit nothing
  private val fixture: Seq[TaggedEvent] = Seq(
    TaggedEvent(1L, 0, 10L, 1000L),
    TaggedEvent(1L, 0, 11L, 1000L), // ts tie — id 11 must win
    TaggedEvent(1L, 1, 100L, 1000L), // inclusive: sees click 11
    TaggedEvent(2L, 1, 200L, 500L), // probe before any build → None
    TaggedEvent(2L, 0, 20L, 900L),
    TaggedEvent(2L, 1, 201L, 950L), // second batch probe, sees 20
    TaggedEvent(3L, 0, 30L, 100L), // build-only key: no output
    TaggedEvent(1L, 0, 12L, 1500L),
    TaggedEvent(1L, 1, 101L, 2000L)) // later batch, sees 12

  test("stream equals batch over the same in-order input") (withRocksDB {
    val s = spark
    import s.implicits._

    val input = MemoryStream[TaggedEvent](AsOfStream.teEnc, s)
    val q = AsOfStream.asofEnrich(input.toDS())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof_ckpt"))
      .start()
    // three microbatches, split in event-time order so the feed is
    // in-order ACROSS batches (the operator's documented contract)
    val ordered = fixture.sortBy(e => (e.tsUs, e.side, e.id))
    ordered.grouped(3).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val got = s.table("asof_stream")
      .select("key", "probeId", "buildId").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    // batch twin over the same rows (µs-exact timestamps — a ms-level
    // Timestamp would merge distinct event times and change ties)
    val clicks = fixture.filter(_.side == 0)
      .map(e => (e.key, e.id, e.tsUs)).toDF("user_id", "click_id", "us")
      .select(col("user_id"), col("click_id"),
        timestamp_micros(col("us")).as("click_ts"))
    val purchases = fixture.filter(_.side == 1)
      .map(e => (e.key, e.id, e.tsUs)).toDF("user_id", "purchase_id", "us")
      .select(col("user_id"), col("purchase_id"),
        timestamp_micros(col("us")).as("purchase_ts"))
    val expected = AsOf.asofJoin(clicks, purchases, "user_id",
      "click_ts", "purchase_ts", "click_id")
      .select("user_id", "purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(got === expected)
    assert(got === Set((1L, 100L, 11L), (2L, 200L, -1L), (2L, 201L, 20L),
      (1L, 101L, 12L)))
  })

  test("forward stream equals the batch forward join on matched rows; " +
    "matchless probes stay pending") (withRocksDB {
    val s = spark
    import s.implicits._
    // forward fixture: equal-ts build tie (ids 41,42 — LOWEST must
    // win), probe at the build's exact ts (inclusive), two probes
    // flushed by one later build, a probe with no later build (batch
    // emits null, stream emits nothing), and a build-only key
    val fwdFixture = Seq(
      TaggedEvent(1L, 1, 100L, 1000L), // probe, waits
      TaggedEvent(1L, 1, 101L, 1200L), // probe, waits
      TaggedEvent(1L, 0, 40L, 1500L),  // flushes both 100 and 101
      TaggedEvent(2L, 1, 200L, 2000L), // probe at build ts — inclusive
      TaggedEvent(2L, 0, 41L, 2000L),  // equal-ts tie: 41 beats 42
      TaggedEvent(2L, 0, 42L, 2000L),
      TaggedEvent(3L, 1, 300L, 9000L), // no later build: stays pending
      TaggedEvent(4L, 0, 50L, 100L))   // build-only key: no output

    val input = MemoryStream[TaggedEvent](AsOfStream.teEnc, s)
    val q = AsOfStream.asofEnrichForward(input.toDS())
      .writeStream.format("memory").queryName("asof_fwd_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof_fwd_ckpt"))
      .start()
    val ordered = fwdFixture.sortBy(e => (e.tsUs, -e.side, e.id))
    ordered.grouped(3).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val got = s.table("asof_fwd_stream")
      .select("key", "probeId", "buildId").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // batch twin, restricted to its matched rows
    val builds = fwdFixture.filter(_.side == 0)
      .map(e => (e.key, e.id, e.tsUs)).toDF("user_id", "click_id", "us")
      .select(col("user_id"), col("click_id"),
        timestamp_micros(col("us")).as("click_ts"))
    val probes = fwdFixture.filter(_.side == 1)
      .map(e => (e.key, e.id, e.tsUs)).toDF("user_id", "purchase_id", "us")
      .select(col("user_id"), col("purchase_id"),
        timestamp_micros(col("us")).as("purchase_ts"))
    val batch = AsOf.asofJoinForward(builds, probes, "user_id",
      "click_ts", "purchase_ts", "click_id")
      .select("user_id", "purchase_id", "click_id").collect()
    val batchMatched = batch.filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batchMatched)
    assert(got === Set((1L, 100L, 40L), (1L, 101L, 40L), (2L, 200L, 41L)))
    // the matchless probe is exactly the batch null row
    assert(batch.filter(_.isNullAt(2)).map(_.getLong(1)).toSeq ==
      Seq(300L))
  })

  test("forward pending state recovers from a checkpoint restart") (withRocksDB {
    val s = spark
    import s.implicits._
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val ckpt = tmpDir("asof_fwd_restart_ckpt")
    val input1 = MemoryStream[TaggedEvent](AsOfStream.teEnc, s)
    def run() = AsOfStream.asofEnrichForward(input1.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[AsOfStream.ForwardMatch], _: Long) =>
        ds.collect().foreach(m => seen.add(m.probeId -> m.buildId))
        ()
      }
      .option("checkpointLocation", ckpt).start()
    val q1 = run()
    // a probe with no build yet: must park in the state store
    input1.addData(Seq(TaggedEvent(7L, 1, 700L, 100L)))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.isEmpty, "probe must stay pending until a build arrives")

    // same source + checkpoint: the pending probe must come back from
    // the state store and match the post-restart build
    input1.addData(Seq(TaggedEvent(7L, 0, 70L, 200L)))
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.asScala.toSet === Set(700L -> 70L))
  })

  test("carry state recovers from a checkpoint restart") (withRocksDB {
    val s = spark
    import s.implicits._

    // the memory sink can't recover a checkpoint — collect through
    // foreachBatch, the CheckpointRecoverySpec pattern
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val ckpt = tmpDir("asof_restart_ckpt")
    val input1 = MemoryStream[TaggedEvent](AsOfStream.teEnc, s)
    def run() = AsOfStream.asofEnrich(input1.toDS())
      .writeStream
      .foreachBatch { (ds: Dataset[AsOfStream.EnrichedProbe], _: Long) =>
        ds.collect().foreach(e => seen.add(e.probeId -> e.buildId.getOrElse(-1L)))
        ()
      }
      .option("checkpointLocation", ckpt).start()
    val q1 = run()
    input1.addData(Seq(TaggedEvent(7L, 0, 70L, 100L)))
    q1.processAllAvailable()
    q1.stop()

    // same source + checkpoint: the carried click must come back from
    // the state store, not from reprocessing batch 0
    input1.addData(Seq(TaggedEvent(7L, 1, 700L, 200L)))
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()

    assert(seen.asScala.toSet === Set(700L -> 70L))
  })

  test("idle carry is evicted after retention: a later probe sees " +
    "None, and the store holds only active keys") (withRocksDB {
    val s = spark
    val input = MemoryStream[TaggedEvent](AsOfStream.teEnc, s)
    // retention 1 s of event time
    val q = AsOfStream.asofEnrich(input.toDS(), retentionMs = 1000L)
      .writeStream.format("memory").queryName("asof_evict")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof_evict_ckpt"))
      .start()
    // key 1 carries a build; an immediate probe enriches from it
    input.addData(Seq(TaggedEvent(1L, 0, 10L, 0L),
      TaggedEvent(1L, 1, 100L, 500000L)))
    q.processAllAvailable()
    // key 2 advances the watermark 10 s past key 1's last activity...
    input.addData(Seq(TaggedEvent(2L, 0, 20L, 10L * 1000000L)))
    q.processAllAvailable()
    // ...and the next trigger applies it: key 1's timer fires
    input.addData(Seq(TaggedEvent(2L, 0, 21L, 11L * 1000000L)))
    q.processAllAvailable()
    // a probe for key 1 now finds no carry — evicted, not stale
    input.addData(Seq(TaggedEvent(1L, 1, 101L, 12L * 1000000L)))
    q.processAllAvailable()
    q.stop()
    val got = s.table("asof_evict")
      .select("probeId", "buildId").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got === Set(100L -> 10L, 101L -> -1L),
      "the pre-retention probe enriches; the post-retention probe " +
        s"must see an evicted carry: $got")
  })

  test("idle pending probes are abandoned after retention: a build " +
    "arriving past the horizon flushes nothing") (withRocksDB {
    val s = spark
    val input = MemoryStream[TaggedEvent](AsOfStream.teEnc, s)
    val q = AsOfStream.asofEnrichForward(input.toDS(),
      retentionMs = 1000L)
      .writeStream.format("memory").queryName("asof_fwd_evict")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof_fwd_evict_ckpt"))
      .start()
    // key 1 parks a pending probe
    input.addData(Seq(TaggedEvent(1L, 1, 100L, 0L)))
    q.processAllAvailable()
    // key 2 runs the watermark 10 s past key 1's last activity, then
    // the next trigger fires key 1's retention timer
    input.addData(Seq(TaggedEvent(2L, 1, 200L, 10L * 1000000L)))
    q.processAllAvailable()
    input.addData(Seq(TaggedEvent(2L, 0, 20L, 11L * 1000000L)))
    q.processAllAvailable()
    // key 1's build arrives after the horizon: the abandoned probe
    // must NOT match (the batch forward join is the repair path)
    input.addData(Seq(TaggedEvent(1L, 0, 10L, 12L * 1000000L)))
    q.processAllAvailable()
    q.stop()
    val got = s.table("asof_fwd_evict")
      .select("probeId", "buildId").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(200L -> 20L),
      s"only key 2's live pair may match: $got")
  })
}
