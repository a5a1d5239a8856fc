package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Sessionize

/** The streaming sessionizer must emit exactly the batch operator's
  * sessions: event-driven closes when a later event exceeds the gap,
  * watermark-timeout closes for idle users, batch replay closing
  * everything at end-of-input.
  */
class SessionStreamSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    // user 1: two sessions (gap 30 min), second has 2 events
    (ts("2024-01-01 00:00:00"), 1L, 1L),
    (ts("2024-01-01 00:10:00"), 1L, 2L),
    (ts("2024-01-01 01:00:00"), 1L, 3L),
    (ts("2024-01-01 01:05:00"), 1L, 4L),
    // user 2: one single-event session
    (ts("2024-01-01 00:20:00"), 2L, 5L),
    // boundary: exactly gap apart => split (>= rule, matches batch)
    (ts("2024-01-01 02:00:00"), 2L, 6L),
    (ts("2024-01-01 02:30:00"), 2L, 7L)
  )

  private def batchSessions = {
    val s = spark
    import s.implicits._
    Sessionize.gapsAndIslands(
        rows.toDF("ts", "user_id", "event_id"), gapSeconds = 1800)
      .select(col("user_id"), unix_micros(col("sess_start")),
        unix_micros(col("sess_end")), col("n_events"))
      .collect().map(_.toSeq).toSet
  }

  test("batch replay equals gapsAndIslands (every session closed)") {
    val s = spark
    import s.implicits._
    val got = SessionStream.sessionStream(
        rows.toDF("ts", "user_id", "event_id"), gapSeconds = 1800)
      .toDF().collect().map(_.toSeq).toSet
    assert(got == batchSessions)
    // 5 sessions: user 1 x2; user 2 x3 (the 02:00->02:30 pair is
    // EXACTLY gap apart, so the >= rule splits it — in both forms)
    assert(got.size == 5)
  }

  test("stream: event-driven and watermark-timeout closes equal batch") {
    withRocksDB {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext

      val mem = MemoryStream[(Timestamp, Long, Long)]
      val q = SessionStream.sessionStream(
          mem.toDF().toDF("ts", "user_id", "event_id"),
          gapSeconds = 1800, watermark = "0 seconds")
        .writeStream.format("memory").queryName("sess_stream_out")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("sess_ckpt"))
        .start()
      try {
        // batch 1: opens sessions for both users
        mem.addData(rows.take(5): _*)
        q.processAllAvailable()
        // batch 2: user 2's 02:00 event closes their 00:20 session
        // (event-driven); watermark moves to 02:30, which passes
        // user 1's horizon 01:05+30min => timeout close
        mem.addData(rows.drop(5): _*)
        q.processAllAvailable()
        // batch 3: watermark needs one more batch to act on 02:30's
        // advance — a far-future marker event flushes the rest
        mem.addData((ts("2024-01-02 00:00:00"), 9L, 8L))
        q.processAllAvailable()
        mem.addData((ts("2024-01-03 00:00:00"), 9L, 9L))
        q.processAllAvailable()

        val got = s.table("sess_stream_out")
          .where(col("user_id") =!= 9L)
          .collect().map(_.toSeq).toSet
        assert(got == batchSessions)
      } finally q.stop()
    }
  }

  test("single user's sessions split correctly across many batches") {
    withRocksDB {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext

      val mem = MemoryStream[(Timestamp, Long, Long)]
      val q = SessionStream.sessionStream(
          mem.toDF().toDF("ts", "user_id", "event_id"),
          gapSeconds = 1800, watermark = "0 seconds")
        .writeStream.format("memory").queryName("sess_stream_one")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("sess_ckpt1"))
        .start()
      try {
        // one event per micro-batch: session continuity must come
        // from state, not in-batch adjacency
        rows.filter(_._2 == 1L).foreach { r =>
          mem.addData(r); q.processAllAvailable()
        }
        mem.addData((ts("2024-01-02 00:00:00"), 9L, 8L))
        q.processAllAvailable()
        mem.addData((ts("2024-01-03 00:00:00"), 9L, 9L))
        q.processAllAvailable()

        val got = s.table("sess_stream_one")
          .where(col("user_id") === 1L)
          .collect().map(_.toSeq).toSet
        val want = batchSessions.filter(_.head == 1L)
        assert(got == want)
      } finally q.stop()
    }
  }

  test("the state store data source reads the sessionizer's live " +
      "state: exactly the OPEN sessions, queryable offline") {
    withRocksDB {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext
      val ckpt = tmpDir("sess_ckpt_inspect")
      val mem = MemoryStream[(Timestamp, Long, Long)]
      val q = SessionStream.sessionStream(
          mem.toDF().toDF("ts", "user_id", "event_id"),
          gapSeconds = 1800, watermark = "0 seconds")
        .writeStream.format("memory").queryName("sess_stream_state")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        // both users get an OPEN session; nothing closes yet
        mem.addData(rows.take(5): _*)
        q.processAllAvailable()
        // Spark 4 ops surface: read the checkpointed state offline —
        // the debugging/audit read a production on-call actually runs
        val state = s.read.format("statestore").load(ckpt)
        val open = state
          .select(col("key.value").as("user_id"),
            col("value.groupState.startUs"),
            col("value.groupState.endUs"),
            col("value.groupState.n"))
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
            r.getLong(3)))).toMap
        // the batch advanced the watermark to 01:05, and the engine's
        // watermark-advance follow-up batch already timeout-closed
        // user 2's idle 00:20 session (horizon 00:50) — so state holds
        // exactly ONE open session: user 1's 01:00-01:05 run (n=2,
        // timeout 01:35 still ahead of the watermark)
        assert(open.keySet == Set(1L))
        assert(open(1L)._3 == 2L)
        assert(open(1L)._1 <= open(1L)._2)
        // and the closed session the state no longer holds is in the
        // sink — state + sink together are the full picture
        assert(s.table("sess_stream_state")
          .where(col("user_id") === 2L).count() == 1)
      } finally q.stop()
    }
  }
}
