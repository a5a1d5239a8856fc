package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of graft.ops.AsOf.asofJoin — as-of enrichment as a
  * typed stateful operator.
  *
  * The batch form sorts each key's full build+probe history in one
  * window pass; a stream can't sort history it hasn't seen, so the
  * streaming form holds exactly the as-of carry — the single latest
  * build row per key — in the state store and enriches probe rows as
  * they arrive. Per key the state is O(1) (two longs + a flag), and
  * the KEY SET is bounded too: an event-time timer per key fires once
  * the watermark runs `retention` past the key's last activity and
  * evicts the entry, so the store tracks recently-active keys, not
  * every key ever seen. A key idle longer than `retention` loses its
  * carry — a later probe enriches to None, and the watermarked batch
  * re-run is the repair path (the same retention contract Spark's own
  * stream-stream joins impose via watermark range conditions). Runs
  * on `transformWithState` (requires the RocksDB state store
  * provider); rows older than the watermark are dropped before the
  * processor.
  *
  * Within a microbatch, a key's rows apply in (tsUs, side, id) order —
  * the batch operator's exact ordering (build before probe at equal
  * timestamps ⇒ inclusive boundary, highest id wins a build-ts tie).
  * Across microbatches the operator is deterministic for in-order
  * feeds; a build row arriving AFTER a later-timestamped probe was
  * already emitted in an earlier batch cannot retro-enrich it (the
  * same late-data caveat every streaming join has).
  */
object AsOfStream {

  /** One tagged input row: side 0 = build (the looked-up stream),
    * side 1 = probe (the enriched stream). */
  final case class TaggedEvent(key: Long, side: Int, id: Long, tsUs: Long)

  /** The as-of carry: latest build row seen for the key. */
  final case class CarryState(buildId: Long, buildTsUs: Long,
                              seen: Boolean)

  /** One output row per probe row (left semantics: no build row seen
    * yet → None). */
  final case class EnrichedProbe(key: Long, probeId: Long, probeTsUs: Long,
                                 buildId: Option[Long],
                                 buildTsUs: Option[Long])

  implicit val teEnc: Encoder[TaggedEvent] = Encoders.product[TaggedEvent]
  implicit val epEnc: Encoder[EnrichedProbe] =
    Encoders.product[EnrichedProbe]
  implicit val csEnc: Encoder[CarryState] = Encoders.product[CarryState]
  implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  /** Forward-match output: one row per probe that found its
    * first-at-or-after build (append-mode streams cannot emit a
    * provisional "no match yet" and retract it later, so a probe with
    * no subsequent build stays pending — the batch
    * `AsOf.asofJoinForward` re-run is the completeness repair path
    * that also emits the null-matched leftovers).
    */
  final case class ForwardMatch(key: Long, probeId: Long, probeTsUs: Long,
                                buildId: Long, buildTsUs: Long)

  /** Pending probes awaiting their forward match. */
  final case class ForwardState(pending: Seq[(Long, Long)])

  implicit val fmEnc: Encoder[ForwardMatch] = Encoders.product[ForwardMatch]
  implicit val fsEnc: Encoder[ForwardState] = Encoders.product[ForwardState]

  /** Shared idle-eviction plumbing: one timer per key, re-armed at
    * every touch to `lastEventMs + retentionMs`. When it fires the
    * watermark has run a full retention past the key's last activity:
    * the concrete processor drops its state and the key leaves the
    * store.
    */
  private sealed abstract class RetentionProcessor[S, O](retentionMs: Long)
      extends StatefulProcessor[Long, TaggedEvent, O] {
    protected def rearm(lastTsUs: Long): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      // +2 ms: the watermark timeline is shifted +1 ms (see
      // `watermarked`) and eviction may round a ms late, never early
      getHandle.registerTimer(
        Math.floorDiv(lastTsUs, 1000L) + 2L + retentionMs)
    }
    protected def disarm(): Unit =
      getHandle.listTimers().foreach(getHandle.deleteTimer)
  }

  private final class CarryProcessor(retentionMs: Long)
      extends RetentionProcessor[CarryState, EnrichedProbe](retentionMs) {
    @transient private var state: ValueState[CarryState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CarryState]("carry", csEnc,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, it: Iterator[TaggedEvent],
                                 timers: TimerValues)
        : Iterator[EnrichedProbe] = {
      var st =
        if (state.exists()) state.get()
        else CarryState(0L, 0L, seen = false)
      val out = Seq.newBuilder[EnrichedProbe]
      // (tsUs, side, id): the batch window's sort order per key
      val evs = it.toSeq.sortBy(e => (e.tsUs, e.side, e.id))
      evs.foreach { e =>
        if (e.side == 0) {
          // later build wins; ties on ts go to the higher id —
          // identical to the batch operator's buildTie contract
          if (!st.seen || e.tsUs > st.buildTsUs ||
            (e.tsUs == st.buildTsUs && e.id > st.buildId))
            st = CarryState(e.id, e.tsUs, seen = true)
        } else {
          out += EnrichedProbe(key, e.id, e.tsUs,
            if (st.seen) Some(st.buildId) else None,
            if (st.seen) Some(st.buildTsUs) else None)
        }
      }
      // only keys that actually carry a build row occupy the state
      // store — a probe-only key must not install an entry (and so
      // needs no eviction timer either)
      if (st.seen) { state.update(st); rearm(evs.last.tsUs) }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo)
        : Iterator[EnrichedProbe] = {
      state.clear()
      Iterator.empty
    }
  }

  private final class ForwardProcessor(retentionMs: Long)
      extends RetentionProcessor[ForwardState, ForwardMatch](retentionMs) {
    @transient private var state: ValueState[ForwardState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ForwardState]("pending", fsEnc,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, it: Iterator[TaggedEvent],
                                 timers: TimerValues)
        : Iterator[ForwardMatch] = {
      var pending =
        if (state.exists()) state.get().pending else Seq.empty[(Long, Long)]
      val out = Seq.newBuilder[ForwardMatch]
      // probe (side 1) sorts BEFORE build (side 0) at equal ts —
      // the forward window's inclusive boundary; equal-ts builds
      // flush in ascending id order so the lowest id wins
      val evs = it.toSeq.sortBy(e => (e.tsUs, -e.side, e.id))
      evs.foreach { e =>
        if (e.side == 1) pending = pending :+ (e.id, e.tsUs)
        else {
          val (matched, still) = pending.partition(_._2 <= e.tsUs)
          matched.foreach { case (pid, pts) =>
            out += ForwardMatch(key, pid, pts, e.id, e.tsUs)
          }
          pending = still
        }
      }
      // only keys with probes still waiting occupy the state store
      if (pending.nonEmpty) {
        state.update(ForwardState(pending)); rearm(evs.last.tsUs)
      } else {
        state.clear(); disarm()
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo)
        : Iterator[ForwardMatch] = {
      // the key went idle a full retention: its pending probes are
      // abandoned (the batch forward join is the repair path that
      // emits them null-matched)
      state.clear()
      Iterator.empty
    }
  }

  /** Event-time column shifted +1 ms against a default 1 ms delay:
    * the net watermark sits exactly at the max event time seen, so
    * the half-open late filter (drops rows at-or-before the
    * watermark) keeps epoch-0 rows and equal-timestamp rows at
    * trigger boundaries — the in-order contract. Timers live on the
    * shifted timeline (see `rearm`).
    */
  private def watermarked(tagged: Dataset[TaggedEvent], lateness: String) =
    tagged.toDF()
      .withColumn("event_time", timestamp_micros(col("tsUs") + 1000L))
      .withWatermark("event_time", lateness)
      .as[TaggedEvent](teEnc)

  /** Streaming twin of graft.ops.AsOf.asofJoinForward — the INVERSE
    * state shape of `asofEnrich`: backward as-of carries one latest
    * build per key (O(1) state, probes emit immediately); the forward
    * join cannot emit a probe until its matching build ARRIVES, so the
    * state buffers the key's pending probes and each incoming build
    * flushes every pending probe at-or-before its timestamp. State is
    * O(probes between consecutive builds) per key — bounded by feed
    * interleaving, not stream length — and a key whose feed stops is
    * evicted whole once the watermark runs `retentionMs` past its
    * last event (see ForwardMatch scaladoc for the repair path).
    *
    * Ordering contract per microbatch: (tsUs, probe-before-build, id)
    * — a probe at the build's exact timestamp matches it (inclusive
    * boundary), and of several builds at one timestamp the LOWEST id
    * flushes first and wins (earliest-wins, the batch tie-break).
    */
  def asofEnrichForward(tagged: Dataset[TaggedEvent],
                        lateness: String = "1 millisecond",
                        retentionMs: Long = 3600000L)
      : Dataset[ForwardMatch] =
    watermarked(tagged, lateness)
      .groupByKey(_.key)
      .transformWithState(new ForwardProcessor(retentionMs),
        TimeMode.EventTime(), OutputMode.Append())

  def asofEnrich(tagged: Dataset[TaggedEvent],
                 lateness: String = "1 millisecond",
                 retentionMs: Long = 3600000L): Dataset[EnrichedProbe] =
    watermarked(tagged, lateness)
      .groupByKey(_.key)
      .transformWithState(new CarryProcessor(retentionMs),
        TimeMode.EventTime(), OutputMode.Append())
}
