package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables
import graft.ops.Relational

case class EvRow(event_type: String, ts: Timestamp, event_id: Long,
                 value: Double)

/** The running-anomaly serving twin: per-event flags from
  * `transformWithState` state must equal the batch window fold
  * (`Relational.runningAnomalies`) on a time-ordered feed, across
  * micro-batch boundaries, surviving a checkpoint restart — all on
  * RocksDB, the store a 100 TB deployment runs.
  */
class AnomalyStreamSpec extends SparkSuite {

  private implicit val evEnc: org.apache.spark.sql.Encoder[EvRow] =
    org.apache.spark.sql.Encoders.product[EvRow]

  test("streaming flags equal the batch window fold across " +
    "micro-batches, on RocksDB")(withRocksDB {
    val s = spark
    val events = Tables.events(s, "/root/testdata/sf0.001")
    val want = Relational.runningAnomalies(events, "event_type",
        "value", "ts", "event_id")
      .select("event_id", "is_anom").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    val feed = events
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => EvRow(r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[EvRow](evEnc, s)
    val q = AnomalyStream.runningAnomalyStream(input.toDF())
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("anom_ckpt"))
      .start()
    feed.grouped(157).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = s.table("anom_stream").select("eventId", "isAnom")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.size == want.size)
    val diff = want.keys.filter(k => got(k) != want(k))
    assert(diff.isEmpty, s"flags diverge for event_ids: ${diff.take(10)}")
    assert(want.values.count(identity) > 0,
      "fixture must contain at least one anomaly or the test is vacuous")
  })

  test("running state recovers from a checkpoint restart")(withRocksDB {
    val s = spark
    // minPrior=3; history 10,10,10 then 40: anomalous only if the
    // restarted query still holds (n=3, s=3000, q=...) from batch 0
    val seen = new ConcurrentLinkedQueue[(Long, Boolean)]()
    val ckpt = tmpDir("anom_restart_ckpt")
    val input = MemoryStream[EvRow](evEnc, s)
    def run() = AnomalyStream
      .runningAnomalyStream(input.toDF(), k = 3, minPrior = 3)
      .writeStream
      .foreachBatch { (ds: Dataset[AnomalyStream.Flag], _: Long) =>
        ds.collect().foreach(f => seen.add(f.eventId -> f.isAnom))
        ()
      }
      .option("checkpointLocation", ckpt).start()
    def ev(id: Long, v: Double) =
      EvRow("click", new Timestamp(1000L + id), id, v)
    val q1 = run()
    input.addData(Seq(ev(1, 10.0), ev(2, 10.0), ev(3, 10.0)))
    q1.processAllAvailable()
    q1.stop()

    input.addData(Seq(ev(4, 40.0), ev(5, 10.0)))
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val got = seen.asScala.toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> true, 5L -> false), s"got $got")
  })

  test("flag predicate: zero-variance history flags any deviation, " +
    "warm-up suppresses early flags") {
    import AnomalyStream.{RunState, flagged}
    // 3 identical priors at 1000: sigma=0 -> any deviation flags
    val st = RunState(3L, 3000L, 3000000L)
    assert(flagged(1001L, st, k = 3, minPrior = 3))
    assert(!flagged(1000L, st, k = 3, minPrior = 3))
    assert(!flagged(5000L, RunState(2L, 2000L, 2000000L), 3, 3),
      "below minPrior: never flags")
    // exact boundary is strict: x*n-s squared == k^2*(n*q - s^2) must
    // NOT flag. priors 900,1100 (n=2,s=2000,q=2020000): rhs=9*(2*2020000
    // - 4000000)=360000; lhs=(x*2-2000)^2 -> x=1300 gives 600^2=360000
    assert(!flagged(1300L, RunState(2L, 2000L, 2020000L), 3, 2))
    assert(flagged(1301L, RunState(2L, 2000L, 2020000L), 3, 2))
  }
}
