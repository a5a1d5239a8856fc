package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's flagship `reduceByKeyAndWindow(_+_, _-_, Minutes(10),
  * Seconds(2), 2)` (reference `examples/.../KafkaWordCount.scala:72`)
  * as TYPED STREAMING STATE at the true 2-second slide — the streaming
  * twin of `StreamOps.wordCountSlidingSlices` (which is the batch
  * form's slice-aggregated rewrite).
  *
  * The DStream held per key a windowed count maintained incrementally:
  * `_+_` folded each new 2-s batch in, `_-_` retired the slice falling
  * off the 10-minute back edge. This operator IS that state machine on
  * the Structured Streaming state store: per word, a bounded map of
  * live 2-s slice counts (≤ `slices` entries); each arriving word
  * increments its slice (`_+_`), and slices behind the advancing head
  * drop from the map (`_-_`, the inverse function as eviction). Every
  * touched slice emits its updated trailing-window total — the
  * DStream's per-tick emission.
  *
  * State is O(live slices) per word — bounded by the window geometry
  * (300 entries max), never by stream length. In-order feeds get exact
  * DStream semantics; a slice arriving after the head has advanced a
  * full window past it is gone from state and cannot retro-update (the
  * same late-data caveat as AsOfStream; the watermarked batch re-run
  * is the repair path).
  */
object SlidingWordCountStream {

  /** One tokenized word occurrence at event-time microseconds. */
  final case class WordAt(word: String, tsUs: Long)

  /** Per-word live slice counts (slice index → occurrences). */
  final case class SliceCounts(counts: Map[Long, Long])

  /** Updated trailing-window total for a touched slice:
    * `cnt` = occurrences in slices (slice-slices, slice], i.e. the
    * 10-minute window ENDING at this slice — the tick the DStream
    * printed every 2 seconds.
    */
  final case class SliceTotal(word: String, sliceTsUs: Long, cnt: Long)

  implicit val waEnc: Encoder[WordAt] = Encoders.product[WordAt]
  implicit val scEnc: Encoder[SliceCounts] = Encoders.product[SliceCounts]
  implicit val stEnc: Encoder[SliceTotal] = Encoders.product[SliceTotal]
  implicit val strEnc: Encoder[String] = Encoders.STRING

  def slidingCounts(words: Dataset[WordAt],
                    sliceSec: Long = 2L,
                    slices: Long = 300L): Dataset[SliceTotal] = {
    val w = sliceSec * 1000000L
    words.groupByKey(_.word)
      .flatMapGroupsWithState[SliceCounts, SliceTotal](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (word, it, state: GroupState[SliceCounts]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
          val touched = scala.collection.mutable.SortedSet.empty[Long]
          it.foreach { e =>
            val s = Math.floorDiv(e.tsUs, w)
            counts = counts.updated(s, counts.getOrElse(s, 0L) + 1L)
            touched += s
          }
          // totals come from the PRE-eviction map, materialized now: a
          // touched slice's window filter (s-slices, s] is its own
          // retirement — evicting first would let a LATER slice in the
          // same batch steal an earlier tick's contributors, and a
          // lazy iterator would observe the evicted map after return
          val emitted = touched.iterator.map { s =>
            val cnt = counts.iterator.collect {
              case (s2, c) if s2 <= s && s2 > s - slices => c
            }.sum
            SliceTotal(word, s * w, cnt)
          }.toVector
          // the inverse function as eviction — but only for CARRIED
          // state: slices a full window behind the head can never
          // contribute to a future emission
          val head = counts.keysIterator.max
          counts = counts.filter { case (s, _) => s > head - slices }
          state.update(SliceCounts(counts))
          emitted.iterator
      }
  }
}
