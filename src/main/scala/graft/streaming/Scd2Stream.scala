package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types.LongType

/** Serving twin of [[graft.ops.Relational.scdType2]]: versioned-
  * dimension maintenance as `transformWithState` — the CDC-to-
  * dimension path run ON the change stream instead of nightly over
  * the accumulated changelog. Per key the state is exactly ONE open
  * version; each arriving change closes it (emitting the finished
  * [valid_from, valid_to) row downstream, append-mode) and becomes
  * the new open version. So the emitted stream is precisely the batch
  * operator's non-current rows, version numbers included — asserted
  * stream == batch in Scd2StreamSpec — while the dimension's current
  * rows ARE the state store, O(keys) forever regardless of how much
  * change history has flowed through.
  *
  * In-batch rows apply in (tsUs, seq) order, so a replayed backlog
  * produces the identical version chain as live arrival. Across
  * micro-batches the feed is assumed per-key monotone (the standard
  * CDC source contract — a partitioned log preserves per-key order);
  * a cross-batch regression in ts would close a version with a
  * negative interval rather than re-sort history. The payload
  * here is the registry's (attr, cents) pair; a production deployment
  * widens the case classes to its dimension's columns.
  */
object Scd2Stream {

  final case class Change(key: Long, tsUs: Long, seq: Long,
                          attr: String, cents: Long)
  final case class OpenVer(tsUs: Long, seq: Long, attr: String,
                           cents: Long, versionN: Long)
  final case class ClosedVer(key: Long, validFromUs: Long,
                             validToUs: Long, attr: String, cents: Long,
                             versionN: Long)

  implicit val chEnc: Encoder[Change] = Encoders.product[Change]
  implicit val cvEnc: Encoder[ClosedVer] = Encoders.product[ClosedVer]

  class Processor
      extends StatefulProcessor[Long, Change, ClosedVer] {
    @transient private var open: ValueState[OpenVer] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenVer]("open",
        Encoders.product[OpenVer], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Change],
                                 timers: TimerValues): Iterator[ClosedVer] = {
      var cur = if (open.exists()) Option(open.get()) else None
      val out = Seq.newBuilder[ClosedVer]
      rows.toSeq.sortBy(c => (c.tsUs, c.seq)).foreach { c =>
        cur.foreach { o =>
          out += ClosedVer(key, o.tsUs, c.tsUs, o.attr, o.cents,
            o.versionN)
        }
        cur = Some(OpenVer(c.tsUs, c.seq, c.attr, c.cents,
          cur.map(_.versionN + 1).getOrElse(1L)))
      }
      cur.foreach(open.update)
      out.result().iterator
    }
  }

  /** changes: streaming frame with (user_id, ts, event_id,
    * event_type, value). Emits one closed version per superseded
    * change; the open (current) version per key lives in state.
    */
  def scd2Stream(changes: DataFrame): Dataset[ClosedVer] =
    changes.select(
        col("user_id").as("key"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("seq"),
        col("event_type").as("attr"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .as[Change](chEnc)
      .groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Append())
}
