package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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
  * State is bounded on BOTH axes. Per key: O(live slices), capped by
  * the window geometry (300 entries max). Across keys: an event-time
  * timer per word fires once the watermark passes the word's horizon —
  * the instant no in-order event can still share a window with any
  * held slice — and clears the entry, so the state-store row count
  * tracks the ACTIVE vocabulary, not every word ever seen (the DStream
  * equally dropped keys whose window drained to zero; `NoTimeout`
  * state here would instead grow monotonically at 100 TB vocabulary).
  * Runs on `transformWithState` (requires the RocksDB state store
  * provider). In-order feeds get exact DStream semantics; rows older
  * than the watermark are dropped before the processor (the standard
  * late-data contract; the watermarked batch re-run is the repair
  * path).
  */
object SlidingWordCountStream {

  /** One tokenized word occurrence at event-time microseconds. */
  final case class WordAt(word: String, tsUs: Long)

  /** Per-word live slice counts as parallel arrays (slice index →
    * occurrences) — the state encoder's Avro schema has no map type,
    * so the store shape is array-of-long pairs; the processor works
    * on the Map view.
    */
  final case class SliceCounts(slices: Array[Long], counts: Array[Long]) {
    def toMap: Map[Long, Long] = slices.zip(counts).toMap
  }
  object SliceCounts {
    def fromMap(m: Map[Long, Long]): SliceCounts = {
      val (ks, vs) = m.toArray.sortBy(_._1).unzip
      SliceCounts(ks, vs)
    }
  }

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

  /** The per-word slice machine. `w` = slice width in µs. One timer
    * per key, re-armed at every touch to the head slice's horizon
    * `(head + slices) · w`: past that watermark no in-order event's
    * window reaches back to any held slice, so the entry is dead
    * weight and `handleExpiredTimer` clears it.
    */
  private final class SliceProcessor(w: Long, slices: Long)
      extends StatefulProcessor[String, WordAt, SliceTotal] {
    @transient private var state: ValueState[SliceCounts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SliceCounts]("slices", scEnc,
        TTLConfig.NONE)

    override def handleInputRows(word: String, it: Iterator[WordAt],
                                 timers: TimerValues)
        : Iterator[SliceTotal] = {
      var counts =
        if (state.exists()) state.get().toMap else Map.empty[Long, Long]
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
      state.update(SliceCounts.fromMap(counts))
      // single eviction timer per key on the SHIFTED watermark
      // timeline (see `slidingCounts`): +2 ms past the head horizon —
      // evicting a couple of ms late is safe, early is not
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(Math.floorDiv((head + slices) * w, 1000L) + 2L)
      emitted.iterator
    }

    override def handleExpiredTimer(word: String, timers: TimerValues,
                                    info: ExpiredTimerInfo)
        : Iterator[SliceTotal] = {
      // watermark passed the head horizon: every held slice is fully
      // retired — drop the key from the store entirely
      state.clear()
      Iterator.empty
    }
  }

  /** `lateness` is the watermark delay on the derived event-time
    * column. The column is shifted +1 ms and the default delay is
    * 1 ms, so the net watermark sits EXACTLY at the max event time
    * seen: the state-store late filter drops rows at-or-before the
    * watermark (a half-open boundary), and without the shift an
    * in-order feed would lose epoch-0 rows to the initial watermark
    * and equal-timestamp rows at trigger boundaries. Timers live on
    * the same shifted timeline.
    */
  def slidingCounts(words: Dataset[WordAt],
                    sliceSec: Long = 2L,
                    slices: Long = 300L,
                    lateness: String = "1 millisecond"): Dataset[SliceTotal] = {
    val w = sliceSec * 1000000L
    words.toDF()
      .withColumn("event_time", timestamp_micros(col("tsUs") + 1000L))
      .withWatermark("event_time", lateness)
      .as[WordAt](waEnc)
      .groupByKey(_.word)
      .transformWithState(new SliceProcessor(w, slices),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
