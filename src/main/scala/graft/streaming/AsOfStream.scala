package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of graft.ops.AsOf.asofJoin — as-of enrichment as a
  * typed stateful operator.
  *
  * The batch form sorts each key's full build+probe history in one
  * window pass; a stream can't sort history it hasn't seen, so the
  * streaming form holds exactly the as-of carry — the single latest
  * build row per key — in the state store and enriches probe rows as
  * they arrive. State is O(1) per key (two longs + a flag): bounded by
  * key cardinality, not stream length, which is what survives an
  * unbounded stream on 1000 executors.
  *
  * Within a microbatch, a key's rows apply in (tsUs, side, id) order —
  * the batch operator's exact ordering (build before probe at equal
  * timestamps ⇒ inclusive boundary, highest id wins a build-ts tie).
  * Across microbatches the operator is deterministic for in-order
  * feeds; a build row arriving AFTER a later-timestamped probe was
  * already emitted in an earlier batch cannot retro-enrich it (the
  * same late-data caveat every streaming join has; the watermarked
  * batch re-run is the repair path, exactly as with wordCountStream).
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

  /** Streaming twin of graft.ops.AsOf.asofJoinForward — the INVERSE
    * state shape of `asofEnrich`: backward as-of carries one latest
    * build per key (O(1) state, probes emit immediately); the forward
    * join cannot emit a probe until its matching build ARRIVES, so the
    * state buffers the key's pending probes and each incoming build
    * flushes every pending probe at-or-before its timestamp. State is
    * O(probes between consecutive builds) per key — bounded by feed
    * interleaving, not stream length; a key whose builds stop leaves
    * its tail probes pending (see ForwardMatch scaladoc).
    *
    * Ordering contract per microbatch: (tsUs, probe-before-build, id)
    * — a probe at the build's exact timestamp matches it (inclusive
    * boundary), and of several builds at one timestamp the LOWEST id
    * flushes first and wins (earliest-wins, the batch tie-break).
    */
  def asofEnrichForward(tagged: Dataset[TaggedEvent])
      : Dataset[ForwardMatch] =
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[ForwardState, ForwardMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state: GroupState[ForwardState]) =>
          var pending =
            state.getOption.map(_.pending).getOrElse(Seq.empty)
          val out = Seq.newBuilder[ForwardMatch]
          // probe (side 1) sorts BEFORE build (side 0) at equal ts —
          // the forward window's inclusive boundary; equal-ts builds
          // flush in ascending id order so the lowest id wins
          it.toSeq.sortBy(e => (e.tsUs, -e.side, e.id)).foreach { e =>
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
          if (pending.nonEmpty) state.update(ForwardState(pending))
          else if (state.exists) state.remove()
          out.result().iterator
      }

  def asofEnrich(tagged: Dataset[TaggedEvent]): Dataset[EnrichedProbe] =
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[CarryState, EnrichedProbe](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state: GroupState[CarryState]) =>
          var st = state.getOption.getOrElse(CarryState(0L, 0L, seen = false))
          val out = Seq.newBuilder[EnrichedProbe]
          // (tsUs, side, id): the batch window's sort order per key
          it.toSeq.sortBy(e => (e.tsUs, e.side, e.id)).foreach { e =>
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
          // store — a probe-only key must not install a permanent
          // empty entry (NoTimeout state is never evicted)
          if (st.seen) state.update(st)
          out.result().iterator
      }
}
