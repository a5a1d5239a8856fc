package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** N6 streaming — the serving twin of
  * [[graft.ops.Sessionize.gapsAndIslands]]: in-flight sessionization
  * on the state store, the reference's gap-split semantics
  * (reference `examples/.../KafkaWordCount.scala` windowing family)
  * upgraded to event-time sessions that CLOSE themselves.
  *
  * Per user the state is exactly ONE open session `(start, end, n)`.
  * A session is emitted (append-mode) when it closes, which happens
  * two ways:
  *  - an event for the same user arrives ≥ gap after the open
  *    session's last event — the event-driven close (identical rule
  *    to the batch operator's `new_sess` mark);
  *  - the WATERMARK passes `last_event + gap` with no new event —
  *    the event-time timeout close, which is the piece batch cannot
  *    express: an idle user's session surfaces as soon as the stream
  *    has provably moved past its horizon, instead of waiting for
  *    that user's next visit.
  *
  * So state is O(active users) forever, and every emitted row equals
  * the batch operator's row for the same events — asserted
  * stream == batch in SessionStreamSpec, including across micro-batch
  * boundaries and on RocksDB.
  *
  * Batch replay (`events.isStreaming == false`): flatMapGroupsWithState
  * runs each group once with no timeouts, so end-of-input closes every
  * open session (`emitFinal`) — output is exactly gapsAndIslands minus
  * the per-user ordinal, which is how the registry row
  * (`sessionize_stream`) shares the batch oracle.
  *
  * In-batch rows apply in (tsUs, eventId) order; across micro-batches
  * events older than the watermark are dropped upstream (standard
  * lateness contract). An event landing INSIDE the open session's
  * span extends it via min/max, so modest cross-batch reordering
  * above the watermark merges correctly rather than splitting.
  *
  * 100 TB shape: one shuffle on user_id into the state store; no
  * window, no sort beyond the per-user in-batch run. The batch form
  * for backfills stays [[graft.ops.Sessionize.gapsAndIslands]] —
  * this operator's per-group sort buffers one user's PER-TRIGGER
  * events, never their full history.
  */
object SessionStream {

  // `ts` rides along only to carry the watermark metadata into the
  // stateful operator (Spark's checker looks for a watermarked
  // attribute among the operator's inputs); the fold reads tsUs.
  final case class Ev(userId: Long, tsUs: Long, eventId: Long,
                      ts: java.sql.Timestamp)
  final case class Open(startUs: Long, endUs: Long, n: Long)
  final case class Closed(user_id: Long, sess_start_us: Long,
                          sess_end_us: Long, n_events: Long)

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val opEnc: Encoder[Open] = Encoders.product[Open]
  implicit val clEnc: Encoder[Closed] = Encoders.product[Closed]

  private def fold(gapUs: Long, streaming: Boolean)(
      key: Long, evs: Iterator[Ev],
      state: GroupState[Open]): Iterator[Closed] = {
    if (streaming && state.hasTimedOut) {
      val o = state.get
      state.remove()
      Iterator.single(Closed(key, o.startUs, o.endUs, o.n))
    } else {
      val out = Seq.newBuilder[Closed]
      var cur = state.getOption
      evs.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
        cur = cur match {
          case Some(o) if e.tsUs - o.endUs < gapUs =>
            Some(Open(math.min(o.startUs, e.tsUs),
              math.max(o.endUs, e.tsUs), o.n + 1))
          case Some(o) =>
            out += Closed(key, o.startUs, o.endUs, o.n)
            Some(Open(e.tsUs, e.tsUs, 1L))
          case None =>
            Some(Open(e.tsUs, e.tsUs, 1L))
        }
      }
      cur.foreach { o =>
        if (streaming) {
          state.update(o)
          state.setTimeoutTimestamp(o.endUs / 1000L + gapUs / 1000L)
        } else {
          // end-of-input IS the close in a batch replay
          out += Closed(key, o.startUs, o.endUs, o.n)
        }
      }
      out.result().iterator
    }
  }

  /** events: (user_id, ts, event_id, …), batch or streaming. Emits
    * one row per CLOSED session; in streaming the open sessions live
    * in state until their gap horizon passes the watermark.
    *
    * `watermark = ""` means `ts` ALREADY carries a watermark from an
    * upstream stateful stage (e.g. near-dup suppression feeding
    * sessionization in one composed query) — re-marking the column
    * there is a Spark analysis error ("redefining watermark is
    * disallowed" under multiple stateful operators).
    */
  def sessionStream(events: DataFrame, gapSeconds: Long = 1800,
                    watermark: String = "30 minutes"): Dataset[Closed] = {
    val streaming = events.isStreaming
    val in = (if (streaming && watermark.nonEmpty)
                events.withWatermark("ts", watermark)
              else events)
      .select(col("user_id").cast("long").as("userId"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").cast("long").as("eventId"),
        col("ts"))
      .as[Ev](evEnc)
    val timeout = if (streaming) GroupStateTimeout.EventTimeTimeout
                  else GroupStateTimeout.NoTimeout
    in.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[Open, Closed](OutputMode.Append, timeout)(
        fold(gapSeconds * 1000000L, streaming))(opEnc, clEnc)
  }
}
