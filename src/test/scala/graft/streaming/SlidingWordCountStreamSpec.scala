package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.StreamOps
import graft.streaming.SlidingWordCountStream.WordAt

/** The true-2s-slide streaming word count: equals the batch
  * slice-aggregated form over the same in-order finite input, the
  * inverse-function eviction keeps per-key state bounded, idle KEYS
  * are evicted once the watermark passes their window horizon, and
  * slice state survives a checkpoint restart. All on RocksDB
  * (`transformWithState`'s contract).
  */
class SlidingWordCountStreamSpec extends SparkSuite {

  private val w = 2000000L
  // "cat" dense around slice 0-3, a burst at slice 299-301 (window
  // retirement in play), a far slice 9000 (total reset); "dog" sparse
  private val fixture: Seq[WordAt] = Seq(
    WordAt("cat", 0 * w), WordAt("dog", 0 * w), WordAt("cat", 1 * w),
    WordAt("cat", 299 * w), WordAt("cat", 300 * w), WordAt("cat", 300 * w),
    WordAt("cat", 301 * w), WordAt("dog", 600 * w), WordAt("cat", 9000 * w))

  test("stream equals the batch slice-aggregated form on an in-order " +
    "feed, retirement included") (withRocksDB {
    val s = spark
    import s.implicits._
    val input = MemoryStream[WordAt](SlidingWordCountStream.waEnc, s)
    val q = SlidingWordCountStream.slidingCounts(input.toDS())
      .writeStream.format("memory").queryName("sliding_2s_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("sliding2s_ckpt"))
      .start()
    // feed slice-by-slice in event-time order (the DStream's ticks)
    fixture.sortBy(_.tsUs).grouped(3).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val got = s.table("sliding_2s_stream")
      .groupBy("word", "sliceTsUs").agg(max("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

    // batch twin over the same rows
    val decoded = fixture.map(e => (e.word, e.tsUs))
      .toDF("value_str", "us")
      .select(col("value_str"), timestamp_micros(col("us")).as("ts"))
    val expected = StreamOps.wordCountSlidingSlices(decoded)
      .select(col("word"), unix_micros(col("slice_ts")).as("us"),
        col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected)
    // spot the retirement arithmetic: window ending at slice 300
    // holds slices 1,299,300 (slice 0 retired) = 4 occurrences
    assert(got.contains(("cat", 300 * w, 4L)))
    assert(got.contains(("cat", 9000 * w, 1L)),
      "a far slice must see a fully-retired window")
  })

  test("slice state survives a checkpoint restart and keeps counting")(
    withRocksDB {
      val s = spark
      import s.implicits._
      val seen = new ConcurrentLinkedQueue[(String, Long, Long)]()
      val ckpt = tmpDir("sliding2s_restart_ckpt")
      val input1 = MemoryStream[WordAt](SlidingWordCountStream.waEnc, s)
      def run() = SlidingWordCountStream.slidingCounts(input1.toDS())
        .writeStream
        .foreachBatch {
          (ds: Dataset[SlidingWordCountStream.SliceTotal], _: Long) =>
            ds.collect().foreach(t =>
              seen.add((t.word, t.sliceTsUs, t.cnt)))
            ()
        }
        .option("checkpointLocation", ckpt).start()
      val q1 = run()
      input1.addData(Seq(WordAt("cat", 10 * w), WordAt("cat", 10 * w)))
      q1.processAllAvailable()
      q1.stop()
      // restart: slice 11's window must include the pre-restart slice 10
      input1.addData(Seq(WordAt("cat", 11 * w)))
      val q2 = run()
      q2.processAllAvailable()
      q2.stop()
      assert(seen.asScala.toSet ==
        Set(("cat", 10 * w, 2L), ("cat", 11 * w, 3L)))
    })

  test("idle keys leave the state store once the watermark passes " +
    "their window horizon") (withRocksDB {
    val s = spark
    val input = MemoryStream[WordAt](SlidingWordCountStream.waEnc, s)
    val q = SlidingWordCountStream.slidingCounts(input.toDS())
      .writeStream.format("memory").queryName("sliding_2s_evict")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("sliding2s_evict_ckpt"))
      .start()
    def stateRows(): Long =
      q.lastProgress.stateOperators.head.numRowsTotal
    // cat parks a slice-0 entry; its horizon is (0+300)·2s = 600 s
    input.addData(Seq(WordAt("cat", 0)))
    q.processAllAvailable()
    val oneKey = stateRows()
    assert(oneKey >= 1L, "cat must occupy state")
    // dog at 700 s pushes the max event time past cat's horizon...
    input.addData(Seq(WordAt("dog", 700L * 1000000L)))
    q.processAllAvailable()
    // ...and once the advanced watermark is applied (another trigger),
    // cat's timer fires and its entry is dropped; dog remains
    input.addData(Seq(WordAt("dog", 701L * 1000000L)))
    q.processAllAvailable()
    val finalRows = stateRows()
    q.stop()
    // one live key's footprint, not two: cat is gone
    assert(finalRows == oneKey,
      s"idle key must be evicted: $finalRows state rows vs $oneKey " +
        "for a single live key")
  })
}
