package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import ConsumerStateMachine.FetchEvent

/** A5/X6 on Spark 4's `transformWithState` — the modern typed-state
  * API (explicit `ValueState` handles, RocksDB-backed, TTL-capable)
  * carrying the same per-partition health the reference kept in
  * gauges + a Meter (reference
  * `PartitionedSimpleConsumerKafkaInputDStream.scala:214-228`,
  * `Meter.mark(consumed)` `:387-389`): offset cursor, processed
  * total, and a deterministic EWMA of per-trigger delivery (α = 1/2,
  * the `StreamOps.throughputEwma` fold — reproducible across replays,
  * unlike a wall-clock Meter).
  *
  * Sibling of `ConsumerStateMachine` (flatMapGroupsWithState): that
  * operator is the error-dispatch state machine; this one is the
  * monitoring surface, written against the newer API so the repo
  * demonstrates both stateful seams Spark 4 offers. State is one
  * small struct per (topic, partition) — bounded by key cardinality,
  * which is what survives 1000 executors. Requires the RocksDB state
  * store provider (`transformWithState`'s contract):
  * `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider`.
  */
object PartitionHealthTws {

  final case class HealthState(offset: Long, processed: Long,
                               ewma: Double, generation: Long)
  final case class HealthUpdate(topic: String, partition: Int,
                                offset: Long, processed: Long,
                                ewma: Double, generation: Long)

  implicit val huEnc: Encoder[HealthUpdate] = Encoders.product[HealthUpdate]
  implicit val keyEnc: Encoder[(String, Int)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaInt)

  class Processor
      extends StatefulProcessor[(String, Int), FetchEvent, HealthUpdate] {
    @transient private var state: ValueState[HealthState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HealthState]("health",
        Encoders.product[HealthState], TTLConfig.NONE)

    override def handleInputRows(key: (String, Int),
                                 rows: Iterator[FetchEvent],
                                 timers: TimerValues)
        : Iterator[HealthUpdate] = {
      val prev =
        if (state.exists()) state.get() else HealthState(0L, 0L, 0.0, 0L)
      // same in-batch ordering contract as ConsumerStateMachine: each
      // partition was owned by one fetch thread (X1), so events apply
      // sequentially
      val evs = rows.toSeq.sortBy(e => (e.eventTimeMs, e.offset))
      val delivered = evs.count(_.error == 0).toLong
      val cursor = evs.foldLeft(prev.offset) { (o, e) =>
        if (e.error == 0 && e.offset >= o) e.offset + 1 else o
      }
      val ewma =
        if (prev.generation == 0L) delivered.toDouble
        else (prev.ewma + delivered.toDouble) / 2.0
      val next = HealthState(cursor, prev.processed + delivered, ewma,
        prev.generation + 1)
      state.update(next)
      Iterator.single(HealthUpdate(key._1, key._2, next.offset,
        next.processed, next.ewma, next.generation))
    }
  }

  /** One health row per seen (topic, partition) per trigger. */
  def apply(events: Dataset[FetchEvent]): Dataset[HealthUpdate] =
    events.groupByKey(e => (e.topic, e.partition))(keyEnc)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Append())
}
