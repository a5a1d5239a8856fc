package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Dedup

case class DedupDoc(ts: Timestamp, doc_id: Long, text: String)

object DedupStreamSpec {
  implicit val docEnc: org.apache.spark.sql.Encoder[DedupDoc] =
    org.apache.spark.sql.Encoders.product[DedupDoc]
}

/** Streaming incremental dedup: every micro-batch doc gets the SAME
  * verdict the daily batch job (`Dedup.incrementalDedupWithIndex`)
  * would give it — asserted row-for-row over a multi-micro-batch feed,
  * on RocksDB, and across a checkpoint restart.
  */
class DedupStreamSpec extends SparkSuite {
  import DedupStreamSpec.docEnc
  type Doc = DedupDoc
  private def Doc(ts: Timestamp, id: Long, text: String): DedupDoc =
    DedupDoc(ts, id, text)

  private def corpusDF = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "an entirely different document about structured streaming"),
      (3L, "the quick brown fox jumps over the lazy dog again tonight"))
      .toDF("doc_id", "text")
  }

  // feed spanning three micro-batches: a near-dup of corpus docs 1/3,
  // a novel doc, an empty doc (no shingles), and two in-stream twins
  // (both keep: the corpus probe never pairs stream docs together)
  private val feed: Seq[Doc] = Seq(
    Doc(new Timestamp(1000L), 10L,
      "the quick brown fox jumps over the lazy dog again today"),
    Doc(new Timestamp(2000L), 11L,
      "completely novel content that matches no corpus entry"),
    Doc(new Timestamp(3000L), 12L, ""),
    Doc(new Timestamp(4000L), 13L,
      "fresh unseen words for the incremental batch verdict"),
    Doc(new Timestamp(5000L), 14L,
      "fresh unseen words for the incremental batch verdict"),
    Doc(new Timestamp(6000L), 15L,
      "an entirely different document about structured streaming"))

  private def verdicts(df: DataFrame): Map[Long, (Long, Long, Boolean)] =
    df.select("doc_id", "n_matches", "best_match_id", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))))
      .toMap

  private def batchTwin: Map[Long, (Long, Long, Boolean)] = {
    val s = spark
    import s.implicits._
    val batch = feed.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val out = Dedup.incrementalDedupWithIndex(
      Dedup.corpusBandIndex(corpusDF, "doc_id", "text"),
      corpusDF, batch, "doc_id", "text", threshold = 0.5)
    out.select("doc_id", "n_matches", "best_match_id", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("mismatched band parameters against the supplied index are " +
    "rejected at construction") {
    val s = spark
    val index = Dedup.corpusBandIndex(corpusDF, "doc_id", "text") // 32 bands
    val input = MemoryStream[DedupDoc](docEnc, s)
    val e = intercept[IllegalArgumentException] {
      DedupStream.incrementalDedupStream(input.toDF(), index,
        DedupStream.corpusSets(corpusDF, "doc_id", "text"),
        "doc_id", "text", "ts", bands = 16)
    }
    assert(e.getMessage.contains("bands"), e.getMessage)
  }

  test("stream verdicts equal the batch incremental dedup, across " +
    "micro-batches, on RocksDB")(withRocksDB {
    val s = spark
    import s.implicits._
    val index =
      Dedup.corpusBandIndex(corpusDF, "doc_id", "text").cache()
    val sets = DedupStream.corpusSets(corpusDF, "doc_id", "text").cache()

    val input = MemoryStream[DedupDoc](docEnc, s)
    val q = DedupStream.incrementalDedupStream(
        input.toDF(), index, sets, "doc_id", "text", "ts",
        threshold = 0.5, watermark = "1 second", windowDur = "10 seconds")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("dedup_ckpt"))
      .start()
    feed.grouped(2).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    // late sentinel far past the window end so the watermark closes
    // the 0-10s window and the append-mode aggregate emits
    input.addData(Doc(new Timestamp(100000L), 999L, "flush sentinel"))
    q.processAllAvailable()
    // both static sides (band index + shingle sets) must probe the
    // persisted cache per trigger (cacheStatic default) — an uncached
    // static side is a corpus re-scan per micro-batch at scale
    val lastPlan = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan
    val cachedScans = lastPlan.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }
    assert(cachedScans.size >= 2,
      s"expected cached index AND sets scans in trigger plan:\n$lastPlan")
    q.stop()

    val got = verdicts(s.table("dedup_stream")
      .filter(col("doc_id") =!= 999L))
    val want = batchTwin
    assert(got == want, s"stream $got != batch $want")
    assert(!got(10L)._3 && got(10L)._1 == 2L && got(10L)._2 == 1L,
      "near-dup flagged with the exact-text corpus doc as best match")
    assert(got(12L) == ((0L, -1L, true)), "empty doc keeps")
    assert(got(13L)._3 && got(14L)._3,
      "in-stream twins both keep — corpus probe only")
  })

  test("verdicts survive a checkpoint restart mid-feed")(withRocksDB {
    val s = spark
    import s.implicits._
    val index =
      Dedup.corpusBandIndex(corpusDF, "doc_id", "text").cache()
    val sets = DedupStream.corpusSets(corpusDF, "doc_id", "text").cache()
    val ckpt = tmpDir("dedup_ckpt_restart")

    // memory sink cannot recover a checkpoint; collect via foreachBatch
    val seen =
      new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long, Boolean)]()
    def start(input: MemoryStream[Doc]) =
      DedupStream.incrementalDedupStream(
          input.toDF(), index, sets, "doc_id", "text", "ts",
          threshold = 0.5, watermark = "1 second",
          windowDur = "10 seconds")
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("doc_id", "n_matches", "best_match_id", "keep")
            .collect().foreach(r => seen.add((r.getLong(0), r.getLong(1),
              if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))))
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()

    val in1 = MemoryStream[DedupDoc](docEnc, s)
    val q1 = start(in1)
    in1.addData(feed.take(3))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint with a fresh source carrying the
    // remainder + the watermark-advancing sentinel
    val in2 = MemoryStream[DedupDoc](docEnc, s)
    in2.addData(feed.take(3)) // replayed offsets resolve from here
    val q2 = start(in2)
    in2.addData(feed.drop(3))
    q2.processAllAvailable()
    in2.addData(Doc(new Timestamp(100000L), 999L, "flush sentinel"))
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val got = seen.asScala.filter(_._1 != 999L)
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got == batchTwin,
      s"restarted stream verdicts diverge: $got != $batchTwin")
  })
}
