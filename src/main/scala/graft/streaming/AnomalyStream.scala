package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types.LongType

/** Serving twin of [[graft.ops.Relational.runningAnomalies]]: per-key
  * running z-score flags as `transformWithState` — each event judged
  * against the (n, Σx, Σx²) accumulated BEFORE it, flag-then-update,
  * the identical integer/DECIMAL-free fold (the comparison runs in
  * BigInt here; the batch twin's DECIMAL(38,0) chain computes the same
  * exact predicate). State is three longs per key — bounded by key
  * cardinality, the only thing that survives 1000 executors — and
  * in-batch rows apply in (eventTimeUs, eventId) order, so a
  * time-ordered feed reproduces the batch window fold row for row
  * (asserted stream == batch in AnomalyStreamSpec).
  */
object AnomalyStream {

  final case class ValEvent(key: String, eventTimeUs: Long, eventId: Long,
                            cents: Long)
  final case class RunState(n: Long, s: Long, q: Long)
  final case class Flag(key: String, eventId: Long, isAnom: Boolean)

  implicit val veEnc: Encoder[ValEvent] = Encoders.product[ValEvent]
  implicit val flagEnc: Encoder[Flag] = Encoders.product[Flag]

  /** The shared flag predicate: with prior (n, s, q),
    * (x·n − s)² > k²·(n·q − s²), no flag before `minPrior` priors.
    */
  def flagged(x: Long, st: RunState, k: Int, minPrior: Int): Boolean =
    st.n >= minPrior && {
      val lhs = BigInt(x * st.n - st.s).pow(2)
      val rhs = BigInt(k.toLong * k) *
        (BigInt(st.n) * BigInt(st.q) - BigInt(st.s).pow(2))
      lhs > rhs
    }

  class Processor(k: Int, minPrior: Int)
      extends StatefulProcessor[String, ValEvent, Flag] {
    @transient private var state: ValueState[RunState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunState]("run",
        Encoders.product[RunState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ValEvent],
                                 timers: TimerValues): Iterator[Flag] = {
      var st = if (state.exists()) state.get() else RunState(0L, 0L, 0L)
      val out = rows.toSeq.sortBy(e => (e.eventTimeUs, e.eventId))
        .map { e =>
          val f = Flag(key, e.eventId, flagged(e.cents, st, k, minPrior))
          st = RunState(st.n + 1, st.s + e.cents, st.q + e.cents * e.cents)
          f
        }
      state.update(st)
      out.iterator
    }
  }

  /** events: streaming frame with (event_type, ts, event_id, value).
    * Emits one (key, eventId, isAnom) row per input event.
    */
  def runningAnomalyStream(events: DataFrame, k: Int = 3,
                           minPrior: Int = 30): Dataset[Flag] = {
    val typed = events.select(
        col("event_type").as("key"),
        unix_micros(col("ts")).as("eventTimeUs"),
        col("event_id").as("eventId"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .as[ValEvent](veEnc)
    typed.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Processor(k, minPrior), TimeMode.None(),
        OutputMode.Append())
  }
}
