package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The incremental-linkage stream must emit the same verdicts as the
  * batch replay: matches only within the block, best by (score desc,
  * id asc), unmatched records flagged is_new — across micro-batch
  * boundaries and on RocksDB.
  */
class LinkageStreamSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val master = Seq(
    (10L, "acme corp", 1, "retail"),
    (11L, "acme c0rp", 1, "bank"),
    (12L, "acme corp", 2, "retail"), // other block
    (13L, "zzz industries", 1, "retail"))

  private val deltas = Seq(
    // matches 10 (dist 0, agree: score 3) and 11 (dist 1, no agree:
    // score 1) in block 1 — best is 10
    (ts("2024-01-01 00:00:00"), 1L, "acme corp", 1, "retail"),
    // same name, block 2 — only 12 matches
    (ts("2024-01-01 00:10:00"), 2L, "acme corp", 2, "auto"),
    // no near name anywhere → is_new
    (ts("2024-01-01 00:20:00"), 3L, "quux holdings", 1, "retail"))

  private def masterDf = {
    val s = spark
    import s.implicits._
    master.toDF("c_id", "name", "nat", "seg")
  }

  private def expected = {
    val s = spark
    import s.implicits._
    LinkageStream.probeStream(
        deltas.toDF("ts", "d_id", "name", "nat", "seg"),
        LinkageStream.nameIndex(masterDf, "c_id", "name", "nat",
          Seq("seg")),
        "d_id", "name", "nat", Seq("seg"), "ts")
      .select(col("id"), col("n_matches"), col("best_match_id"),
        col("best_score"), col("is_new"))
      .collect().map(_.toSeq).toSet
  }

  test("batch replay: verdicts match the hand model") {
    val got = expected
    assert(got == Set(
      Seq(1L, 2L, 10L, 3L, false),
      Seq(2L, 1L, 12L, 2L, false),
      Seq(3L, 0L, null, null, true)))
  }

  test("stream == batch across micro-batches (RocksDB)") {
    withRocksDB {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext

      val mem = MemoryStream[(Timestamp, Long, String, Int, String)]
      val q = LinkageStream.probeStream(
          mem.toDF().toDF("ts", "d_id", "name", "nat", "seg"),
          LinkageStream.nameIndex(masterDf, "c_id", "name", "nat",
            Seq("seg")),
          "d_id", "name", "nat", Seq("seg"), "ts",
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("linkage_out")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("linkage_ckpt"))
        .start()
      try {
        mem.addData(deltas.take(2): _*)
        q.processAllAvailable()
        mem.addData(deltas.drop(2): _*)
        q.processAllAvailable()
        // flush the 00:00 window past the watermark
        mem.addData((ts("2024-01-02 00:00:00"), 9L, "flush", 1, "x"))
        q.processAllAvailable()
        mem.addData((ts("2024-01-03 00:00:00"), 9L, "flush", 1, "x"))
        q.processAllAvailable()

        val got = s.table("linkage_out")
          .where(col("id") =!= 9L)
          .select(col("id"), col("n_matches"), col("best_match_id"),
            col("best_score"), col("is_new"))
          .collect().map(_.toSeq).toSet
        assert(got == expected)
      } finally q.stop()
    }
  }
}
