package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

case class LmDoc(ts: Timestamp, doc_id: Long, text: String)

object LmScoreStreamSpec {
  implicit val docEnc: org.apache.spark.sql.Encoder[LmDoc] =
    org.apache.spark.sql.Encoders.product[LmDoc]
}

/** Streaming LM quality gate: stream scores must equal the batch run
  * of the same scorer (same model, same docs), across micro-batches,
  * on RocksDB; the pair-count static side must probe the persisted
  * cache per trigger; unseen bigrams/prefixes take the Laplace
  * back-off, never a dropped row.
  */
class LmScoreStreamSpec extends SparkSuite {
  import LmScoreStreamSpec.docEnc

  private def corpusDF = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran off the mat"),
      (3L, "a dog sat on a log"))
      .toDF("doc_id", "text")
  }

  // in-model text, half-seen text, fully-unseen text, 1-token doc
  // (no bigram evidence: absent from output)
  private val feed = Seq(
    LmDoc(new Timestamp(1000L), 10L, "the cat sat on the mat"),
    LmDoc(new Timestamp(2000L), 11L, "the cat sat on zzz qqq"),
    LmDoc(new Timestamp(3000L), 12L, "qq ww ee rr tt yy"),
    LmDoc(new Timestamp(4000L), 13L, "single"))

  private def scores(df: DataFrame): Map[Long, (Long, Long)] =
    df.select("doc_id", "n_bigrams", "fp_sum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("stream scores equal the batch scorer, across micro-batches, " +
    "on RocksDB")(withRocksDB {
    val s = spark
    import s.implicits._
    val model = LmScoreStream.trainModel(corpusDF, "text")
    val batch = scores(LmScoreStream.scoreStream(
      feed.map(d => (d.ts, d.doc_id, d.text))
        .toDF("ts", "doc_id", "text"),
      model, "doc_id", "text", "ts"))

    val input = MemoryStream[LmDoc](docEnc, s)
    val q = LmScoreStream.scoreStream(input.toDF(), model,
        "doc_id", "text", "ts",
        windowDur = "10 seconds", watermark = "1 second")
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("lm_ckpt"))
      .start()
    try {
      feed.grouped(2).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      input.addData(LmDoc(new Timestamp(100000L), 999L, "flush flush"))
      q.processAllAvailable()
      val got = scores(s.table("lm_stream")
        .filter(col("doc_id") =!= 999L))
      assert(got == batch, s"stream $got vs batch $batch")
      assert(!got.contains(13L), "1-token doc has no bigram evidence")
      // pair-count static side probed from the persisted cache
      val lastPlan = q.asInstanceOf[org.apache.spark.sql.execution
          .streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      val cachedScans = lastPlan.collect {
        case c: org.apache.spark.sql.execution.columnar
          .InMemoryTableScanExec => c
      }
      assert(cachedScans.nonEmpty,
        "pairCounts must probe the persisted cache per trigger")
    } finally q.stop()
  })

  test("Laplace back-off: fully-unseen doc scores 2^20 div vocab " +
    "per bigram") {
    val s = spark
    import s.implicits._
    val model = LmScoreStream.trainModel(corpusDF, "text")
    // corpus vocab: the,cat,sat,on,mat,ran,off,a,dog,log = 10
    assert(model.vocab == 10L)
    val out = scores(LmScoreStream.scoreStream(
      Seq((new Timestamp(1000L), 20L, "qq ww ee"))
        .toDF("ts", "doc_id", "text"),
      model, "doc_id", "text", "ts"))
    // each unseen bigram: (0+1)*2^20 div (0+10) = 104857
    assert(out(20L) == ((2L, 2L * 104857L)))
  }
}
