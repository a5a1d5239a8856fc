package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming EMD drift monitor: windows finalized under the watermark
  * equal the batch replay, and the gap weighting makes the score the
  * true Wasserstein-1 over the bucket grid.
  */
class DriftStreamSpec extends SparkSuite {

  private def ref = {
    val s = spark
    import s.implicits._
    // reference histogram: buckets 0 and 4 (a gap of 4), 2 rows each
    Seq((0L, 2L), (4L, 2L)).toDF("bkt", "n")
  }

  test("stream equals batch replay; late window finalizes once") (withRocksDB {
    val s = spark
    import s.implicits._
    val enc = Encoders.tuple(Encoders.TIMESTAMP,
      Encoders.scalaDouble)
    val input = MemoryStream[(Timestamp, Double)](enc, s)
    def e(t: String, v: Double) = (Timestamp.valueOf(t), v)
    val day1 = Seq(e("2026-01-01 01:00:00", 1.00),
      e("2026-01-01 02:00:00", 7.00),
      e("2026-01-01 03:00:00", 21.00))
    val day2 = Seq(e("2026-01-02 05:00:00", 1.00))
    val sentinel = Seq(e("2026-01-05 12:00:00", 2.00))
    val q = DriftStream.emdStream(
        input.toDF().toDF("ts", "value"), ref)
      .writeStream.format("memory").queryName("drift_stream_t")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("driftck"))
      .start()
    input.addData(day1)
    q.processAllAvailable()
    input.addData(day2)
    q.processAllAvailable()
    input.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    val got = s.table("drift_stream_t").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      .toSet
    val batch = DriftStream.emdStream(
        (day1 ++ day2).toDF("ts", "value"), ref)
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == batch)
    assert(got.size == 2)
  })

  test("gap weighting: identical histograms score zero, shifted mass " +
      "pays the full gap") {
    val s = spark
    import s.implicits._
    // window == reference -> EMD 0
    val same = Seq(
      (Timestamp.valueOf("2026-01-01 01:00:00"), 1.00),
      (Timestamp.valueOf("2026-01-01 02:00:00"), 1.50),
      (Timestamp.valueOf("2026-01-01 03:00:00"), 21.00),
      (Timestamp.valueOf("2026-01-01 04:00:00"), 22.00))
      .toDF("ts", "value")
    val r0 = DriftStream.emdStream(same, ref).collect().head
    assert(r0.getAs[Long]("emd_num") == 0L)
    // all mass at bucket 0 vs the 2+2 reference: |F diffs| walk the
    // 0->4 gap: cum grid {0,4}: at 0: |4*4 - 2*4| * 4 = 32; at 4: 0
    val allLow = Seq.fill(4)(
        (Timestamp.valueOf("2026-01-01 01:00:00"), 1.00))
      .toDF("ts", "value")
    val r1 = DriftStream.emdStream(allLow, ref).collect().head
    assert(r1.getAs[Long]("emd_num") == 32L)
    assert(r1.getAs[Double]("emd_buckets") == 2.0)
  }
}
