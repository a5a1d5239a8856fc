package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The persisted text-index changelog: latest-wins resolution must be
  * row-equivalent to indexing the current corpus from scratch —
  * including re-adds over tombstones and re-indexed (changed) document
  * text — and the probe must stay bucket-pruned and survive
  * compaction unchanged.
  */
class TextIndexStoreSpec extends SparkSuite {

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def livePostings(dir: String): Set[(Long, String, Long, Long)] =
    TextIndexStore.read(spark, dir)._1
      .select("doc_id", "term", "tf", "dl").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def scratch(docs: org.apache.spark.sql.DataFrame, dir: String)
      : Set[(Long, String, Long, Long)] = {
    TextIndexStore.append(docs, "doc_id", "text", dir, 0L)
    livePostings(dir)
  }

  test("append/tombstone/re-add/re-index resolve latest-wins and " +
    "equal a from-scratch index; compaction preserves it") {
    val dir = tmpDir("text_idx")
    TextIndexStore.append(corpus(
      (1L, "spark stream spark"), (2L, "vector query"),
      (3L, "old text here"), (4L, "stream stream")),
      "doc_id", "text", dir, 0L)
    // delete 2 and 3; re-add 3 with CHANGED text; re-index 4 too
    TextIndexStore.tombstone(corpus((2L, ""), (3L, "")), "doc_id", dir, 1L)
    TextIndexStore.append(corpus(
      (3L, "fresh vector text"), (4L, "stream query")),
      "doc_id", "text", dir, 2L)

    val want = scratch(corpus(
      (1L, "spark stream spark"), (3L, "fresh vector text"),
      (4L, "stream query")), tmpDir("text_idx_scratch"))
    assert(livePostings(dir) == want,
      "changelog resolution must equal from-scratch indexing")
    // docstats: only live docs, latest dl
    val stats = TextIndexStore.read(spark, dir)._2
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats == Map(1L -> 3L, 3L -> 3L, 4L -> 2L))

    // probe before/after compaction is identical
    def probe() = TextIndexStore
      .bm25Probe(spark, dir, Seq("spark", "stream"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val before = probe()
    assert(before.nonEmpty)
    TextIndexStore.compact(spark, dir, compactSeq = 9L)
    assert(probe() == before, "compaction must not change the probe")
    assert(livePostings(dir) == want)
    // tombstones directory cleared
    assert(!new java.io.File(dir, "tombstones").exists())
  }

  test("streaming maintenance folds add/del micro-batches into the " +
    "same live index a batch rebuild implies")(withRocksDB {
    val s = spark
    import s.implicits._
    val dir = tmpDir("text_idx_stream")
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String, String)] =
      org.apache.spark.sql.Encoders.product[(Long, String, String)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](enc, s)
    val q = graft.streaming.TextIndexStream.maintainStream(
      input.toDF().toDF("doc_id", "text", "op"),
      dir, "doc_id", "text", "op", tmpDir("text_idx_ckpt"))
    input.addData(Seq((1L, "spark stream", "add"),
      (2L, "vector query", "add")))
    q.processAllAvailable()
    input.addData(Seq((2L, "", "del"), (3L, "fresh text", "add"),
      (1L, "spark spark reindexed", "add")))
    q.processAllAvailable()
    q.stop()
    val want = scratch(corpus(
      (1L, "spark spark reindexed"), (3L, "fresh text")),
      tmpDir("text_idx_stream_scratch"))
    assert(livePostings(dir) == want)
  })

  test("streaming BM25 probe equals the batch probe across " +
    "micro-batches, static side cached")(withRocksDB {
    val s = spark
    import s.implicits._
    val dir = tmpDir("text_idx_probe")
    TextIndexStore.append(corpus(
      (1L, "spark stream spark window"), (2L, "vector query stream"),
      (3L, "spark vector vector"), (4L, "query query stream spark"),
      (5L, "merge sort table")), "doc_id", "text", dir, 0L)
    val (posts, stats) = TextIndexStore.read(s, dir)
    val srow = stats.agg(count(lit(1)).as("n"), sum(col("dl")).as("sl"))
      .head()
    implicit val enc: org.apache.spark.sql.Encoder[
        (java.sql.Timestamp, Long, Seq[String])] =
      org.apache.spark.sql.Encoders.product[
        (java.sql.Timestamp, Long, Seq[String])]
    def reqRows = (0 until 6).map { r =>
      val terms = r % 3 match {
        case 0 => Seq("spark", "stream")
        case 1 => Seq("vector", "query", "spark")
        case _ => Seq("query")
      }
      (new java.sql.Timestamp(1700000000000L + r * 1000L), r.toLong, terms)
    }
    val want = graft.streaming.TextIndexStream.bm25ProbeStream(posts,
        srow.getLong(0), srow.getLong(1),
        reqRows.toDF("ts", "req_id", "terms"), "ts", "req_id", "terms",
        k = 3)
      .select("req_id", "doc_id", "rk", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Seq[String])](enc, s)
    val q = graft.streaming.TextIndexStream.bm25ProbeStream(posts,
        srow.getLong(0), srow.getLong(1),
        input.toDF().toDF("ts", "req_id", "terms"), "ts", "req_id",
        "terms", k = 3, watermark = "1 second", windowDur = "1 minute")
      .writeStream.format("memory").queryName("text_probe")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("text_probe_ckpt"))
      .start()
    reqRows.grouped(2).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    // sentinel far past the window closes it for append emission
    input.addData(Seq((new java.sql.Timestamp(1700099000000L), 999L,
      Seq("spark"))))
    q.processAllAvailable()
    val lastPlan = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan
    assert(lastPlan.collect {
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
    }.nonEmpty, "static scored postings must probe from cache")
    q.stop()
    val got = s.table("text_probe").filter(col("req_id") =!= 999L)
      .select("req_id", "doc_id", "rk", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want,
      s"stream/batch diverge: only-stream=${got diff want}, " +
        s"only-batch=${want diff got}")
  })

  test("probing an un-appended store returns an empty, correctly " +
    "shaped frame") {
    val df = TextIndexStore.bm25Probe(spark,
      tmpDir("text_idx_absent"), Seq("spark"), k = 3)
    assert(df.columns.toSeq == Seq("doc_id", "rk", "score", "s_spark"))
    assert(df.count() == 0)
  }

  test("probe scan prunes to the query terms' hash buckets") {
    val dir = tmpDir("text_idx_prune")
    TextIndexStore.append(corpus(
      (1L, "spark stream"), (2L, "merge sort table scan window batch")),
      "doc_id", "text", dir, 0L)
    val probe = TextIndexStore.bm25Probe(spark, dir, Seq("spark"), k = 3)
    // the bucket predicate constant-folds to a literal partition
    // filter on the postings scan (house plan-string check — the
    // executedPlan nests scans under AQE wrappers)
    val plan = probe.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("bucket"),
      s"expected a bucket partition filter in:\n$plan")
    assert(!plan.contains("PartitionFilters: []") ||
      plan.split("PartitionFilters: ").exists(s =>
        s.startsWith("[") && !s.startsWith("[]")),
      s"every postings scan unpruned:\n$plan")
  }
}
