package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Relational

/** The streaming dimension build must emit exactly the batch
  * operator's closed (non-current) versions — version numbers
  * included — with the current versions living in the state store,
  * across micro-batch boundaries and on RocksDB.
  */
class Scd2StreamSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream emits batch's closed versions across batch boundaries") {
    withRocksDB {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext

      val rows = Seq(
        (ts("2024-01-01 00:00:00"), 1L, 1L, "a", 1.00),
        (ts("2024-01-02 00:00:00"), 1L, 2L, "b", 2.00),
        (ts("2024-01-02 00:00:00"), 1L, 3L, "c", 3.00), // ts tie
        (ts("2024-01-05 00:00:00"), 2L, 4L, "x", 7.00),
        // second batch: closes versions opened in the first
        (ts("2024-02-01 00:00:00"), 1L, 5L, "d", 4.00),
        (ts("2024-02-02 00:00:00"), 2L, 6L, "y", 8.00)
      )
      val batchDf = rows.toDF("ts", "user_id", "event_id", "event_type",
        "value")

      val mem = MemoryStream[(Timestamp, Long, Long, String, Double)]
      val q = Scd2Stream.scd2Stream(
          mem.toDF().toDF("ts", "user_id", "event_id", "event_type",
            "value"))
        .writeStream.format("memory").queryName("scd2_stream_out")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("scd2_ckpt"))
        .start()
      try {
        mem.addData(rows.take(4).map(r =>
          (r._1, r._2, r._3, r._4, r._5)): _*)
        q.processAllAvailable()
        mem.addData(rows.drop(4).map(r =>
          (r._1, r._2, r._3, r._4, r._5)): _*)
        q.processAllAvailable()

        val got = s.table("scd2_stream_out")
          .select("key", "validFromUs", "validToUs", "attr", "cents",
            "versionN")
          .collect().map(_.toSeq).toSet

        val want = Relational.scdType2(
            batchDf.select(col("user_id"), col("ts"), col("event_id"),
              col("event_type"),
              round(col("value") * 100).cast("long").as("cents")),
            "user_id", "ts", "event_id", Seq("event_type", "cents"))
          .where(!col("is_current"))
          .select(col("user_id"),
            unix_micros(col("valid_from")),
            unix_micros(col("valid_to")),
            col("event_type"), col("cents"), col("version_n"))
          .collect().map(_.toSeq).toSet

        assert(got == want)
        assert(got.size == 4, "two open versions stay in state")
      } finally q.stop()
    }
  }

  test("open versions survive a checkpoint kill-and-restart") {
    withRocksDB {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext
      val ckpt = tmpDir("scd2_ckpt_restart")
      // memory sink cannot recover a checkpoint; collect via
      // foreachBatch (the DedupStreamSpec pattern)
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long, String, Long, Long)]()
      def start(in: MemoryStream[(Timestamp, Long, Long, String, Double)]) =
        Scd2Stream.scd2Stream(
            in.toDF().toDF("ts", "user_id", "event_id", "event_type",
              "value"))
          .writeStream
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[Scd2Stream.ClosedVer],
             _: Long) =>
              df.collect().foreach(v => seen.add((v.key, v.validFromUs,
                v.validToUs, v.attr, v.cents, v.versionN)))
          }
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()

      val batch1 = Seq(
        (ts("2024-01-01 00:00:00"), 1L, 1L, "a", 1.00),
        (ts("2024-01-02 00:00:00"), 1L, 2L, "b", 2.00))
      val batch2 = Seq(
        (ts("2024-02-01 00:00:00"), 1L, 3L, "c", 3.00),
        (ts("2024-02-02 00:00:00"), 1L, 4L, "d", 4.00))

      val in1 = MemoryStream[(Timestamp, Long, Long, String, Double)]
      val q1 = start(in1)
      in1.addData(batch1: _*)
      q1.processAllAvailable()
      q1.stop()

      // restart: version numbering and the open version must continue
      // from recovered state, not restart at 1
      val in2 = MemoryStream[(Timestamp, Long, Long, String, Double)]
      in2.addData(batch1: _*) // replayed offsets resolve from here
      val q2 = start(in2)
      in2.addData(batch2: _*)
      q2.processAllAvailable()
      q2.stop()

      import scala.jdk.CollectionConverters._
      val got = seen.asScala.toSet
      val wantClosed = Set(
        (1L, unixUs("2024-01-01 00:00:00"), unixUs("2024-01-02 00:00:00"),
          "a", 100L, 1L),
        (1L, unixUs("2024-01-02 00:00:00"), unixUs("2024-02-01 00:00:00"),
          "b", 200L, 2L),
        (1L, unixUs("2024-02-01 00:00:00"), unixUs("2024-02-02 00:00:00"),
          "c", 300L, 3L))
      assert(got == wantClosed,
        s"restarted version chain diverges: $got")
    }
  }

  private def unixUs(t: String): Long =
    ts(t).getTime * 1000L
}
