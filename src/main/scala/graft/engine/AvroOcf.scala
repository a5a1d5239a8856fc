package graft.engine

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** S6/S7 — Avro Object-Container-File codec on plain `org.apache.avro`
  * (no spark-avro module in this environment), rebuilding the
  * reference's `AvroDatumUtils` (reference `AvroDatumUtils.scala:15-25`
  * serialize, `:32-37` decode): OCF bytes are SELF-DESCRIBING — the
  * writer schema travels in the container header and is read back at
  * decode time, exactly like the reference's
  * `dataFileStream.getSchema`.
  *
  * The one-blob→many-rows decode runs distributed as the
  * graft.functions.AvroOcfExplode Generator; `packEvents` is the
  * test-feed harness (S12 twin) producing OCF-packed payloads.
  */
object AvroOcf {

  /** S7 — records → container-file bytes, schema from the caller (the
    * reference took it from the first record).
    */
  def serialize(schema: Schema, records: Iterator[GenericRecord]): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, baos)
    records.foreach(w.append)
    w.close()
    baos.toByteArray
  }

  /** S6 — container-file bytes → (embedded writer schema, records). */
  def records(data: Array[Byte]): (Schema, Seq[GenericRecord]) = {
    val s = new DataFileStream[GenericRecord](
      new ByteArrayInputStream(data),
      new GenericDatumReader[GenericRecord]())
    try {
      val schema = s.getSchema
      val buf = ArrayBuffer.empty[GenericRecord]
      while (s.hasNext) buf += s.next()
      (schema, buf.toSeq)
    } finally s.close()
  }

  /** The slim event payload the pack/decode queries carry. */
  val eventSchema: Schema = SchemaBuilder.record("Event").fields()
    .requiredLong("user_id")
    .requiredString("event_type")
    .requiredLong("event_id")
    .endRecord()

  val eventStructType: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("event_id", LongType)))

  final case class EventSlim(user_id: Long, event_type: String,
                             event_id: Long)

  /** S12 twin — the test-feed harness: pack events into one OCF blob
    * per shard, the shape of a Kafka `value` carrying an Avro batch.
    * Typed groupByKey → mapGroups (one shuffle on the shard key); the
    * per-group materialization is the feed harness's bounded batch,
    * not a production path (a production packer would chunk groups).
    */
  def packEvents(events: DataFrame, numShards: Int = 8): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "event_type", "event_id").as[EventSlim]
      .groupByKey(e => e.user_id % numShards)
      .mapGroups { (shard, it) =>
        val recs = it.map { e =>
          val r = new GenericData.Record(eventSchema)
          r.put("user_id", e.user_id)
          r.put("event_type", e.event_type)
          r.put("event_id", e.event_id)
          r: GenericRecord
        }
        (shard, serialize(eventSchema, recs))
      }
      .toDF("shard", "value")
  }
}
