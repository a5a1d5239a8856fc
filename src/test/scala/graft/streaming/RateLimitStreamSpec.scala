package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

/** Token-bucket verdicts: burst then throttle then refill, batch
  * replay == hand fold, stream == batch across micro-batches, and
  * state eviction after capacity·period idle changes NO verdict.
  */
class RateLimitStreamSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  // capacity 2, one token per hour
  private val rows = Seq(
    // user 1 burst: 2 accepted (full bucket), 3rd throttled
    (1L, 1L, ts("2024-01-01 00:00:00")),
    (1L, 2L, ts("2024-01-01 00:01:00")),
    (1L, 3L, ts("2024-01-01 00:02:00")),
    // 59 min later: still only ~1 token refilled since t=0? balance
    // after 3rd event = 2h·µs·... hand-checked below via batch fold
    (1L, 4L, ts("2024-01-01 01:01:00")),
    // user 2: spaced out, all accepted
    (2L, 5L, ts("2024-01-01 00:00:00")),
    (2L, 6L, ts("2024-01-01 02:00:00")),
    (2L, 7L, ts("2024-01-01 04:00:00"))
  )

  private def batch(evs: Seq[(Long, Long, Timestamp)])
      : Map[Long, Boolean] = {
    val s = spark
    import s.implicits._
    RateLimitStream.rateLimit(
        evs.toDF("user_id", "event_id", "ts"),
        capacityTokens = 2, periodSec = 3600)
      .collect().map(v => v.event_id -> v.accepted).toMap
  }

  test("batch replay: burst accepted, overflow throttled, refill works") {
    val got = batch(rows)
    // user 1: full bucket (2 tokens) → 1,2 accepted; 3 throttled
    // (only 2 min of refill); event 4 at +61 min: refill since the
    // throttled read ≈ 59 min + the 2 min already banked ≈ 1.01
    // tokens → accepted
    assert(got == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> true, 5L -> true, 6L -> true, 7L -> true))
  }

  test("stream == batch, and idle eviction preserves verdicts") {
    withRocksDB {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext
      val mem = MemoryStream[(Long, Long, Timestamp)]
      val q = RateLimitStream.rateLimit(
          mem.toDF().toDF("user_id", "event_id", "ts"),
          capacityTokens = 2, periodSec = 3600,
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("rl_out")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("rl_ckpt"))
        .start()
      try {
        // split the burst across micro-batches: state must carry.
        // Feeds stay watermark-monotonic (delay 0): a batch never
        // carries an event older than a previous batch's max ts
        mem.addData(rows(0), rows(1), rows(4))
        q.processAllAvailable()
        mem.addData(rows(2), rows(3), rows(5))
        q.processAllAvailable()
        mem.addData(rows(6))
        q.processAllAvailable()
        // push the watermark past every bucket's full-refill horizon
        // (2 h idle) so user 1/2 state is EVICTED...
        mem.addData((9L, 90L, ts("2024-01-02 00:00:00")))
        q.processAllAvailable()
        mem.addData((9L, 91L, ts("2024-01-02 12:00:00")))
        q.processAllAvailable()
        // ...then a post-eviction event must see a FULL bucket, which
        // is exactly what the batch fold computes for the same gap
        val late = (1L, 10L, ts("2024-01-02 18:00:00"))
        mem.addData(late)
        q.processAllAvailable()
        val got = s.table("rl_out")
          .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
        val expect = batch(rows :+ late) ++
          Map(90L -> true, 91L -> true)
        assert(got == expect)
        assert(got(10L)) // full bucket after idle
      } finally q.stop()
    }
  }
}
