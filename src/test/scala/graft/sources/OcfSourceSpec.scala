package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.KafkaShape

/** S1/S2/S5/S8/S10 — the graft-ocf DataSourceV2 contract:
  *  - batch write → batch read round-trips the 7-column Kafka frame
  *  - the V2 commit protocol leaves no temp files and clusters rows by
  *    partition, offset-ordered within each container
  *  - the MicroBatchStream slices the backlog into offset-range
  *    microbatches under maxRecordsPerTrigger (S5)
  *  - a restarted query resumes from the checkpointed offset and
  *    consumes ONLY records appended after the first run (S10)
  */
class OcfSourceSpec extends SparkSuite {

  private def kafkaDf(from: Int, until: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (from until until).map { i =>
      (i.toLong, s"payload_$i")
    }.toDF("id", "props").select(
      col("id").cast("string").cast("binary").as("key"),
      col("props").cast("binary").as("value"),
      lit("events").as("topic"),
      (col("id") % 4).cast("int").as("partition"),
      col("id").as("offset"),
      lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
      lit(0).as("timestampType"))
  }

  test("batch write -> batch read round-trips the Kafka frame") {
    val dir = tmpDir("ocf_store")
    kafkaDf(0, 200).write.format("graft-ocf").mode("overwrite").save(dir)
    val back = spark.read.format("graft-ocf").load(dir)
    assert(back.schema == KafkaShape.schema)
    val got = KafkaShape.decodeUtf8(back)
      .select("key_str", "value_str", "kpartition", "koffset")
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = (0 until 200).map(i =>
      (i.toString, s"payload_$i", (i % 4).toLong, i.toLong)).toSet
    assert(got == want)

    // commit protocol hygiene: only committed containers remain (plus
    // Hadoop LocalFileSystem's hidden .crc sidecars) — no temp files —
    // and each holds offset-ordered runs (RequiresDistributionAndOrdering)
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
      .filterNot(_.startsWith("."))
    assert(files.nonEmpty && files.forall(_.endsWith(".ocf")),
      s"stray files: $files")
    files.foreach { f =>
      val s = new org.apache.avro.file.DataFileStream(
        new java.io.FileInputStream(s"$dir/$f"),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try {
        val recs = Iterator.continually(s)
          .takeWhile(_.hasNext).map(_.next())
          .map(r => (r.get("partition").asInstanceOf[Int],
            r.get("offset").asInstanceOf[Long])).toSeq
        recs.groupBy(_._1).foreach { case (_, rs) =>
          val offs = rs.map(_._2)
          assert(offs == offs.sorted,
            s"offsets not ordered within container $f")
        }
      } finally s.close()
    }
  }

  test("overwrite truncates previously committed containers") {
    val dir = tmpDir("ocf_trunc")
    kafkaDf(0, 100).write.format("graft-ocf").mode("overwrite").save(dir)
    kafkaDf(500, 550).write.format("graft-ocf").mode("overwrite").save(dir)
    val offsets = spark.read.format("graft-ocf").load(dir)
      .select("offset").collect().map(_.getLong(0)).toSet
    assert(offsets == (500L until 550L).toSet)
  }

  test("S5: maxRecordsPerTrigger slices the backlog into microbatches") {
    val s = spark
    val dir = tmpDir("ocf_stream")
    kafkaDf(0, 300).write.format("graft-ocf").mode("overwrite").save(dir)
    val q = s.readStream.format("graft-ocf")
      .option("maxRecordsPerTrigger", "100")
      .load(dir)
      .writeStream.format("memory").queryName("ocf_batches")
      .option("checkpointLocation", tmpDir("ocf_ckpt"))
      .start()
    q.processAllAvailable()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(s.table("ocf_batches").count() == 300)
    assert(nBatches >= 3,
      s"300 rows at 100/trigger must take >= 3 microbatches, got $nBatches")
    val got = s.table("ocf_batches").select("offset").collect()
      .map(_.getLong(0)).toSet
    assert(got == (0L until 300L).toSet, "no loss, no duplication")
  }

  test("A1 over the real connector: word count on a graft-ocf stream " +
      "equals the batch result") {
    // the swap-the-source contract: the SAME downstream pipeline
    // (decode -> tokenize -> windowed count) runs unchanged whether the
    // source is MemoryStream (StreamingEquivalenceSpec) or the real
    // DataSourceV2 connector
    val s = spark
    import s.implicits._
    val dir = tmpDir("ocf_wc")
    val base = Timestamp.valueOf("2026-01-01 10:00:00").getTime
    val kafka = (0 until 300).map { i =>
      (i.toLong, s"alpha beta_${i % 5} gamma_${i % 3}")
    }.toDF("id", "props").select(
      col("id").cast("string").cast("binary").as("key"),
      col("props").cast("binary").as("value"),
      lit("events").as("topic"),
      (col("id") % 4).cast("int").as("partition"),
      col("id").as("offset"),
      to_timestamp(from_unixtime(lit(base / 1000) + col("id") * 7))
        .as("timestamp"),
      lit(0).as("timestampType"))
    kafka.write.format("graft-ocf").mode("overwrite").save(dir)

    val q = graft.streaming.StreamingPipelines.wordCountStream(
        s.readStream.format("graft-ocf")
          .option("maxRecordsPerTrigger", "75").load(dir),
        "10 minutes", Some("2 minutes"))
      .writeStream.format("memory").queryName("ocf_wc")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("ocf_wc_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()

    val expected = graft.ops.StreamOps.wordCountWindow(
        KafkaShape.decodeUtf8(kafka), "10 minutes", Some("2 minutes"))
      .orderBy("w_start", "word").collect().toSeq
    val got = s.table("ocf_wc").orderBy("w_start", "word").collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("S10: restart resumes from the checkpointed offset, no replay") {
    val s = spark
    val dir = tmpDir("ocf_recover")
    val ckpt = tmpDir("ocf_recover_ckpt")
    kafkaDf(0, 80).write.format("graft-ocf").mode("overwrite").save(dir)

    // memory sink cannot recover a checkpoint — collect via
    // foreachBatch, which participates in the recovery protocol
    def run(): Seq[Long] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = s.readStream.format("graft-ocf").load(dir)
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("offset").collect().foreach(r => buf.add(r.getLong(0)))
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }
    val first = run()
    assert(first.toSet == (0L until 80L).toSet)

    // append a second generation of containers, then restart on the
    // SAME checkpoint: only the appended records may arrive
    kafkaDf(80, 120).write.format("graft-ocf").mode("append").save(dir)
    val second = run()
    assert(second.toSet == (80L until 120L).toSet,
      s"restart must consume exactly the appended records, got " +
        s"${second.size} rows")
  }

  test("partition reader block-skips to mid-file ranges exactly") {
    // force a MULTI-BLOCK container (payloads big enough to cross the
    // ~64KB Avro sync interval many times), then read mid-file ranges
    // through the reader directly: the block-header skip must land on
    // exactly the requested records, including starts inside a block
    val s = spark
    import s.implicits._
    val dir = tmpDir("ocf_blocks")
    val n = 20000
    val pad = "x" * 150
    (0 until n).map(i => (i.toLong, s"payload_${i}_$pad")).toDF("id", "props")
      .select(
        col("id").cast("string").cast("binary").as("key"),
        col("props").cast("binary").as("value"),
        lit("events").as("topic"),
        lit(0).cast("int").as("partition"),
        col("id").as("offset"),
        lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
        lit(0).as("timestampType"))
      .write.format("graft-ocf").mode("overwrite").save(dir)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val counts = OcfStore.headCounts(dir, conf.value)
    val (fname, total) = counts.maxBy(_._2)
    assert(total >= 10000, s"expected one fat container, got $counts")
    // the container must really span multiple blocks for this test to
    // exercise the skip loop
    val blocks = {
      val st = new org.apache.avro.file.DataFileStream(
        new java.io.FileInputStream(s"$dir/$fname"),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try {
        var b = 0
        while (st.hasNext) { b += 1; st.nextBlock() }
        b
      } finally st.close()
    }
    assert(blocks > 3, s"container has only $blocks block(s)")
    def offsetsInRange(a: Long, b: Long): Seq[Long] = {
      val reader = OcfReaderFactory(conf)
        .createReader(OcfRange(s"$dir/$fname", a, b))
      try {
        val out = scala.collection.mutable.ArrayBuffer[Long]()
        while (reader.next()) out += reader.get().getLong(4)
        out.toSeq
      } finally reader.close()
    }
    val full = offsetsInRange(0L, total)
    assert(full.length == total.toInt)
    for ((a, b) <- Seq((0L, 10L), (total / 2 - 37, total / 2 + 91),
        (total - 53, total))) {
      val got = offsetsInRange(a, b)
      assert(got == full.slice(a.toInt, b.toInt),
        s"range [$a,$b) mismatch: got ${got.take(5)}...")
    }
  }
}
