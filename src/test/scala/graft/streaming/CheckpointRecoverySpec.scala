package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.{RocksDBStateStore, SparkSuite}

/** S10 streaming — committed-offset recovery: a restarted query resumes
  * from the checkpoint's offset log and reprocesses NOTHING (the strict
  * upgrade over the reference's HBase read-back + at-least-once replay,
  * reference `…InputDStream.scala:178-196,207-211`).
  */
class CheckpointRecoverySpec extends SparkSuite with RocksDBStateStore {

  test("restart from checkpoint resumes after the committed offset") {
    val s = spark
    val ckpt = tmpDir("recover_ckpt")
    val seen = new ConcurrentLinkedQueue[Long]()
    def run(input: org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[KafkaRecord]): org.apache.spark.sql.streaming
        .StreamingQuery =
      input.toDF().writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("offset").collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()

    def rec(off: Long) = KafkaRecord.ofEvent(1L, s"p$off", off,
      new Timestamp(1700000000000L + off * 1000))

    // run 1: offsets 0..49 committed, then the query stops
    val input1 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[KafkaRecord](KafkaRecord.encoder, s)
    val q1 = run(input1)
    input1.addData((0L until 50L).map(rec))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.asScala.toSeq.sorted == (0L until 50L))

    // run 2: SAME checkpoint, the source already holds 0..49 plus new
    // data — the offset log must skip the committed prefix entirely
    input1.addData((50L until 80L).map(rec))
    val q2 = run(input1)
    q2.processAllAvailable()
    q2.stop()

    val all = seen.asScala.toSeq
    assert(all.sorted == (0L until 80L),
      s"expected exactly-once 0..79, got ${all.sorted.take(90)}")
    assert(all.size == 80, s"records reprocessed: ${all.size} != 80")
  }
}
