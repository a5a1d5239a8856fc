package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.SetSimJoin

case class SetSimDoc(ts: Timestamp, doc_id: Long, text: String)

object SetSimStreamSpec {
  implicit val docEnc: org.apache.spark.sql.Encoder[SetSimDoc] =
    org.apache.spark.sql.Encoders.product[SetSimDoc]
}

/** Exact streaming near-dup gate: verdicts must agree with the exact
  * batch probe (SetSimJoin.probeDelta) pair-for-pair, across
  * micro-batches, on RocksDB — the theorem (no false negatives)
  * carried into the stream.
  */
class SetSimStreamSpec extends SparkSuite {
  import SetSimStreamSpec.docEnc

  private def corpusDF = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different sentence about spark engines here"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
  }

  private val feed = Seq(
    SetSimDoc(new Timestamp(1000L), 10L,
      "zz qq the quick brown fox jumps over the lazy dog today"),
    SetSimDoc(new Timestamp(2000L), 11L,
      "one two three four five six seven eight nine ten"),
    SetSimDoc(new Timestamp(3000L), 12L,
      "nothing in here overlaps with anything from that corpus"),
    SetSimDoc(new Timestamp(4000L), 13L,
      "an entirely different sentence about spark engines here"))

  private def verdicts(df: DataFrame): Map[Long, (Long, Long, Boolean)] =
    df.select("doc_id", "n_matches", "best_match_id", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))))
      .toMap

  test("stream verdicts equal the exact batch probe, across " +
    "micro-batches, on RocksDB")(withRocksDB {
    val s = spark
    import s.implicits._
    val idx = SetSimJoin.prefixIndex(corpusDF, "doc_id", "text")
    // batch reference through the SAME streaming code path (it runs
    // unchanged on a batch frame), plus the pair-exactness anchor:
    // probeDelta's matched ids per doc
    val batchDf = feed.map(d => (d.ts, d.doc_id, d.text))
      .toDF("ts", "doc_id", "text")
    val batch = verdicts(SetSimStream.exactProbeStream(
      batchDf, idx, "doc_id", "text", "ts"))
    val pairs = SetSimJoin.probeDelta(batchDf, idx, "doc_id", "text")
      .select("delta_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact anchors: 10 matches 1 (unseen-shingle near-dup), 11
    // matches 3 (identical), 13 matches 2 (identical), 12 matches none
    assert(pairs == Set((10L, 1L), (11L, 3L), (13L, 2L)), s"$pairs")
    assert(batch(10L) == ((1L, 1L, false)))
    assert(batch(12L) == ((0L, -1L, true)))

    val input = MemoryStream[SetSimDoc](docEnc, s)
    val q = SetSimStream.exactProbeStream(input.toDF(), idx,
        "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("setsim_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("setsim_ckpt"))
      .start()
    try {
      feed.grouped(2).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      input.addData(SetSimDoc(new Timestamp(100000L), 999L,
        "late flush sentinel row for the watermark"))
      q.processAllAvailable()
      val got = verdicts(s.table("setsim_stream")
        .filter(col("doc_id") =!= 999L))
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q.stop()
  })
}
