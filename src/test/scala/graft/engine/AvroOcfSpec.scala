package graft.engine

import org.apache.avro.SchemaBuilder
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSuite
import graft.functions.GraftFunctions

/** S6/S7: OCF encode→decode round-trips arbitrary records, the writer
  * schema is read back from the container (self-describing), and the
  * Generator decode projects by name with nulls for unknown fields.
  */
class AvroOcfSpec extends SparkSuite {

  private def rec(u: Long, t: String, e: Long): GenericRecord = {
    val r = new GenericData.Record(AvroOcf.eventSchema)
    r.put("user_id", u); r.put("event_type", t); r.put("event_id", e)
    r
  }

  test("round-trip preserves ScalaCheck-generated records and schema") {
    val gen = for {
      u <- Gen.choose(Long.MinValue, Long.MaxValue)
      t <- Gen.oneOf(Gen.alphaNumStr, Gen.const(""),
        Gen.const("unicode: déjà vu ☃"))
      e <- Gen.choose(0L, Long.MaxValue)
    } yield (u, t, e)
    val data = (1 to 200).flatMap(_ => gen.sample)
    val bytes = AvroOcf.serialize(AvroOcf.eventSchema,
      data.map { case (u, t, e) => rec(u, t, e) }.iterator)
    val (schema, back) = AvroOcf.records(bytes)
    assert(schema.toString == AvroOcf.eventSchema.toString,
      "writer schema must travel in the container header")
    val got = back.map(r => (r.get("user_id").asInstanceOf[Long],
      r.get("event_type").toString, r.get("event_id").asInstanceOf[Long]))
    assert(got == data)
  }

  test("decodeWithDlq: poison containers quarantine with raw bytes " +
    "and error text; clean records pass; nothing vanishes") {
    val s = spark
    import s.implicits._
    val good = AvroOcf.serialize(AvroOcf.eventSchema,
      Seq(rec(1, "click", 10), rec(2, "view", 11)).iterator)
    val poison = "not an avro container".getBytes("UTF-8")
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val kafka = Seq(
      (good, "events", 0, 100L, ts),
      (poison, "events", 0, 101L, ts),
      (good, "events", 1, 102L, ts))
      .toDF("value", "topic", "partition", "offset", "timestamp")
    val out = graft.streaming.StreamingPipelines
      .decodeWithDlq(kafka, AvroOcf.eventStructType)
    val clean = out.filter(col("decode_error").isNull)
    val dlq = out.filter(col("decode_error").isNotNull)
    assert(clean.count() == 4, "two good blobs x two records")
    assert(clean.select("raw").collect().forall(_.isNullAt(0)),
      "clean rows carry no raw bytes")
    val q = dlq.collect()
    assert(q.length == 1, "one poison container, one quarantine row")
    val r = q.head
    assert(r.getAs[Long]("offset") == 101L,
      "quarantine keeps the record identity")
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("raw"), poison),
      "quarantine keeps the raw bytes for replay")
    assert(r.getAs[String]("decode_error").nonEmpty)
    assert(r.isNullAt(r.fieldIndex("event_id")))
  }

  test("decodeWithDlq on a stream: the query survives poison bytes " +
    "and the quarantine is exact (stream == batch)") {
    val s = spark
    import s.implicits._
    import graft.streaming.{KafkaRecord, KafkaShapedStream}
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val good = AvroOcf.serialize(AvroOcf.eventSchema,
      Seq(rec(5, "click", 50)).iterator)
    val data = Seq(
      KafkaRecord(null, good, "events", 0, 1L, ts, 0),
      KafkaRecord(null, "garbage".getBytes, "events", 0, 2L, ts, 0),
      KafkaRecord(null, good, "events", 1, 3L, ts, 0))
    val (input, kafkaStream) = KafkaShapedStream.memory(s)
    val q = graft.streaming.StreamingPipelines
      .decodeWithDlq(kafkaStream, AvroOcf.eventStructType)
      .writeStream.format("memory").queryName("dlq_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("dlq_ckpt"))
      .start()
    input.addData(data)
    q.processAllAvailable()
    q.stop()
    val got = s.table("dlq_stream")
    assert(got.filter(col("decode_error").isNull).count() == 2)
    val dlqRows = got.filter(col("decode_error").isNotNull).collect()
    assert(dlqRows.map(_.getAs[Long]("offset")).toSeq == Seq(2L))
    // the same operator code on the batch frame agrees row-for-row
    val batch = graft.streaming.StreamingPipelines
      .decodeWithDlq(s.createDataset(data).toDF(),
        AvroOcf.eventStructType)
    assert(batch.orderBy("offset", "event_id").collect().toSeq ==
      got.orderBy("offset", "event_id").collect().toSeq)
  }

  test("AvroOcfExplode: one blob explodes to N typed rows, distributed") {
    val s = spark
    import s.implicits._
    val blobs = Seq(
      ("b1", AvroOcf.serialize(AvroOcf.eventSchema,
        Seq(rec(1, "click", 10), rec(2, "view", 11)).iterator)),
      ("b2", AvroOcf.serialize(AvroOcf.eventSchema,
        Seq(rec(3, "click", 12)).iterator)))
      .toDF("blob_id", "value")
    val rows = blobs.select(col("blob_id"),
        GraftFunctions.avroOcfExplode(col("value"), AvroOcf.eventStructType)
          .as(Seq("user_id", "event_type", "event_id")))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("b1", 1L, "click", 10L), ("b1", 2L, "view", 11L),
      ("b2", 3L, "click", 12L)))
  }

  test("decode projects by name: unknown target fields become null") {
    val s = spark
    import s.implicits._
    val widerTarget = org.apache.spark.sql.types.StructType(
      AvroOcf.eventStructType.fields :+
        org.apache.spark.sql.types.StructField("not_written",
          org.apache.spark.sql.types.StringType))
    val blob = Seq(Tuple1(AvroOcf.serialize(AvroOcf.eventSchema,
      Seq(rec(7, "x", 70)).iterator))).toDF("value")
    val r = blob.select(
        GraftFunctions.avroOcfExplode(col("value"), widerTarget)
          .as(Seq("user_id", "event_type", "event_id", "not_written")))
      .head()
    assert(r.getLong(0) == 7L && r.isNullAt(3))
  }

  test("permissive decode drops garbage blobs; strict mode fails") {
    val s = spark
    import s.implicits._
    val good = AvroOcf.serialize(AvroOcf.eventSchema,
      Seq(rec(1, "ok", 1)).iterator)
    val garbage = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val df = Seq(("good", good), ("bad", garbage)).toDF("tag", "value")
    val permissive = df.select(col("tag"),
        GraftFunctions.avroOcfExplode(col("value"),
          AvroOcf.eventStructType, permissive = true)
          .as(Seq("user_id", "event_type", "event_id")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(permissive.toSeq == Seq(("good", 1L)),
      "permissive mode keeps decodable rows and drops garbage")
    intercept[Exception] {
      df.select(GraftFunctions.avroOcfExplode(col("value"),
          AvroOcf.eventStructType)
          .as(Seq("user_id", "event_type", "event_id")))
        .collect()
    }
  }

  test("permissive decode drops individually-undecodable RECORDS, " +
      "keeping the rest of the blob") {
    val s = spark
    import s.implicits._
    // writer schema with a union-typed event_id: one record carries a
    // long (coerces to the LongType target), one carries a string
    // (cannot coerce) — per-record permissive granularity, not
    // per-blob
    val unionSchema = SchemaBuilder.record("Event2").fields()
      .requiredLong("user_id")
      .requiredString("event_type")
      .name("event_id").`type`().unionOf().longType().and().stringType()
      .endUnion().noDefault()
      .endRecord()
    def rec2(u: Long, e: Any): GenericRecord = {
      val r = new GenericData.Record(unionSchema)
      r.put("user_id", u); r.put("event_type", "t"); r.put("event_id", e)
      r
    }
    val blob = AvroOcf.serialize(unionSchema,
      Seq(rec2(1, 10L), rec2(2, "not-a-long"), rec2(3, 30L)).iterator)
    val df = Seq(Tuple1(blob)).toDF("value")
    val permissive = df.select(
        GraftFunctions.avroOcfExplode(col("value"),
          AvroOcf.eventStructType, permissive = true)
          .as(Seq("user_id", "event_type", "event_id")))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(permissive == Seq((1L, 10L), (3L, 30L)),
      "only the type-mismatched record is dropped")
    intercept[Exception] {
      df.select(GraftFunctions.avroOcfExplode(col("value"),
          AvroOcf.eventStructType)
          .as(Seq("user_id", "event_type", "event_id")))
        .collect()
    }
  }

  test("packEvents -> explode round-trips the events table") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val decoded = AvroOcf.packEvents(events)
      .select(GraftFunctions.avroOcfExplode(col("value"),
        AvroOcf.eventStructType)
        .as(Seq("user_id", "event_type", "event_id")))
    val got = decoded.orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = events.selectExpr("user_id", "event_type", "event_id")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
  }
}
