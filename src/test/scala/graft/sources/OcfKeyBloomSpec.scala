package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.KafkaShape

/** Key-Bloom container skipping: a store written with `keyBloomBits`
  * records a per-container Bloom filter over record keys (plus the
  * null-key census) in its commit manifest; key-equality scans then
  * prune whole containers before any file opens — the compacted-topic
  * point-lookup path. The contract stays advisory: Spark re-evaluates
  * every predicate per row, so Bloom false positives cost I/O, never
  * correctness, and stores without the field never prune.
  */
class OcfKeyBloomSpec extends SparkSuite {

  private def kafkaDf(from: Int, until: Int,
                      nullKeyPartition: Int = -1): DataFrame = {
    val s = spark
    import s.implicits._
    (from until until).map(i => (i.toLong, s"payload_$i"))
      .toDF("id", "props").select(
        when(col("id") % 4 === nullKeyPartition, lit(null))
          .otherwise(col("id").cast("string").cast("binary")).as("key"),
        col("props").cast("binary").as("value"),
        lit("events").as("topic"),
        (col("id") % 4).cast("int").as("partition"),
        col("id").as("offset"),
        lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
        lit(0).as("timestampType"))
  }

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("builder never false-negatives and the manifest line round-trips") {
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(5000)(rnd.nextBytes(1 + rnd.nextInt(24)))
    val b = new OcfKeyBloom.Builder(keys.size * 10)
    keys.foreach(b.add)
    b.addNull(); b.addNull()
    val kb = b.result()
    assert(keys.forall(kb.mightContain), "bloom must admit every added key")
    assert(kb.nulls == 2L)

    val st = OcfFileStats("part-0.ocf", keys.size + 2L, 0L, 10L, 0L, 1L,
      Seq(0, 1), Seq(OcfTsIdxEntry(4096L, 99L, 123L)), Some(kb))
    val back = OcfFileStats.fromJson(st.toJson)
    assert(back.contains(st), s"round trip lost fields: ${st.toJson}")

    // pre-r10 manifest lines (no keyBloom) still parse, bloom absent
    val legacy = OcfFileStats("f.ocf", 1L, 0L, 0L, 0L, 0L, Seq(0))
    assert(OcfFileStats.fromJson(legacy.toJson)
      .exists(_.keyBloom.isEmpty))
  }

  test("key-equality scan opens only containers whose bloom admits " +
    "the key") {
    val dir = tmpDir("ocf_keybloom")
    kafkaDf(0, 400).write.format("graft-ocf")
      .option("keyBloomBits", "8192").option("targetFiles", "4")
      .mode("overwrite").save(dir)
    val containers = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".ocf") && !f.getName.startsWith("."))
    assert(containers >= 2, s"need a multi-container store: $containers")

    val back = spark.read.format("graft-ocf").load(dir)
    // clustered-by-partition write puts all of Kafka partition 1 (and
    // with it key "5") into exactly one container
    val hit = back.filter(col("key") === lit(utf8("5")))
    assert(hit.rdd.getNumPartitions == 1,
      s"bloom must prune down to the one container holding key 5 " +
        s"(of $containers)")
    val rows = KafkaShape.decodeUtf8(hit)
      .select("key_str", "value_str").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("5", "payload_5")))

    // an absent key prunes everything — a zero-I/O miss
    val miss = back.filter(col("key") === lit(utf8("not-a-key")))
    assert(miss.count() == 0)
    assert(miss.rdd.getNumPartitions == 0,
      "a key no container can hold must plan zero input partitions")

    // IN over keys of two Kafka partitions keeps at most their two
    // containers (one, if the clustered write co-located them)
    val in2 = back.filter(col("key").isin(utf8("5"), utf8("6")))
    val kept = in2.rdd.getNumPartitions
    assert(kept >= 1 && kept <= 2, s"IN kept $kept of $containers")
    assert(in2.count() == 2)
  }

  test("null-key census prunes IS NULL / IS NOT NULL scans") {
    val dir = tmpDir("ocf_keybloom_null")
    // install 1: all-null keys; install 2: all keyed — two appends,
    // so each predicate's candidate containers are exactly one
    // install's files
    kafkaDf(0, 100).select(lit(null).cast("binary").as("key"),
      col("value"), col("topic"), col("partition"), col("offset"),
      col("timestamp"), col("timestampType"))
      .write.format("graft-ocf")
      .option("keyBloomBits", "8192").mode("overwrite").save(dir)
    kafkaDf(100, 400).write.format("graft-ocf")
      .option("keyBloomBits", "8192").mode("append").save(dir)
    val back = spark.read.format("graft-ocf").load(dir)
    val total = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".ocf") && !f.getName.startsWith("."))
    assert(total >= 2)

    val nulls = back.filter(col("key").isNull)
    assert(nulls.count() == 100)
    val notNulls = back.filter(col("key").isNotNull)
    assert(notNulls.count() == 300)
    assert(nulls.rdd.getNumPartitions +
      notNulls.rdd.getNumPartitions == total,
      "each container is all-null or all-keyed, so the two scans " +
        "must partition the store")
  }

  test("a store written without keyBloomBits never prunes on key " +
    "but stays correct") {
    val dir = tmpDir("ocf_keybloom_off")
    kafkaDf(0, 400).write.format("graft-ocf")
      .option("targetFiles", "4").mode("overwrite").save(dir)
    val containers = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".ocf") && !f.getName.startsWith("."))
    val back = spark.read.format("graft-ocf").load(dir)
    val hit = back.filter(col("key") === lit(utf8("5")))
    assert(hit.rdd.getNumPartitions == containers,
      "no bloom in the manifest => conservative keep-all")
    assert(hit.count() == 1)
  }

  test("streaming sink epochs carry the bloom and prune like batch " +
    "installs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = tmpDir("ocf_keybloom_stream")
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF().select(
        col("value").cast("string").cast("binary").as("key"),
        concat(lit("p_"), col("value")).cast("binary").as("value"),
        lit("events").as("topic"),
        (col("value") % 4).cast("int").as("partition"),
        col("value").as("offset"),
        lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
        lit(0).as("timestampType"))
      .writeStream.format("graft-ocf")
      .option("keyBloomBits", "8192").option("targetFiles", "4")
      .option("checkpointLocation", tmpDir("ocf_keybloom_stream_ckpt"))
      .start(dir)
    mem.addData(0L until 200L: _*)
    q.processAllAvailable()
    q.stop()

    val back = s.read.format("graft-ocf").load(dir)
    val total = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".ocf") && !f.getName.startsWith("."))
    val hit = back.filter(col("key") === lit(utf8("42")))
    assert(hit.rdd.getNumPartitions < total,
      s"bloom pruning must drop some of the $total containers")
    assert(KafkaShape.decodeUtf8(hit).select("value_str")
      .as[String].collect().toSeq == Seq("p_42"))
  }
}
