package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch-mode forms of the reference's streaming dataflow operators.
  * Each runs identically on a streaming DataFrame (same expressions; see
  * graft.streaming for the MemoryStream twins exercised in tests).
  */
object StreamOps {

  /** A1 + P3–P5 — the reference's flagship query: sliding-window word
    * count over decoded record values
    * (reference `examples/.../KafkaWordCount.scala:67-72`,
    * `reduceByKeyAndWindow(_+_, _-_, Minutes(10), Seconds(2), 2)`).
    * Here: tokenize the decoded value, bucket by event time. Structured
    * Streaming's state store does the incremental (inverse-function)
    * maintenance natively when this runs on a stream.
    *
    * @param slide None → tumbling; Some(d) → sliding windows.
    */
  def wordCountWindow(decoded: DataFrame,
                      windowDur: String = "10 minutes",
                      slide: Option[String] = None): DataFrame = {
    // P3 first: the example drops the key (`map(_._2)`) and tokenizes
    // the value only (reference `KafkaWordCount.scala:67,70`).
    val words = decoded.select(
      col("ts"),
      explode(split(col("value_str"), " ")).as("word"))
    val w = slide match {
      case Some(s) => window(col("ts"), windowDur, s)
      case None    => window(col("ts"), windowDur)
    }
    words.groupBy(w.as("win"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("w_start"), col("word"), col("cnt"))
  }

  /** A1 in the reference's TRUE geometry — 10-minute window sliding
    * every 2 SECONDS (reference `examples/.../KafkaWordCount.scala:72`,
    * `reduceByKeyAndWindow(_+_, _-_, Minutes(10), Seconds(2), 2)`), the
    * inverse-function incremental trick in relational form.
    *
    * `window(ts, "10 minutes", "2 seconds")` would plan an Expand with
    * window/slide = 300 projections per input row (300x the data before
    * the aggregate, and a janino-breaking generated switch). Instead:
    * (1) aggregate once per (word, 2-s slice) — one shuffle, map-side
    * partial agg, output ≤ one row per word per slice; (2) a per-word
    * RANGE window over slice index bounded at 299 preceding slices
    * sums the last 10 minutes — exactly the DStream's running count at
    * each slice where the word occurs (`_+_` adds the new slice,
    * `_-_` retires the slice falling off the back; the RANGE bound IS
    * that retirement, declaratively). No Expand anywhere; the window
    * is partitioned by word, so at 100 TB it parallelizes per word and
    * each partition holds (word x live-slice) rows, not raw events.
    */
  def wordCountSlidingSlices(decoded: DataFrame,
                             sliceSec: Long = 2L,
                             slices: Long = 300L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = sliceSec * 1000000L
    val perSlice = decoded
      .select(explode(split(col("value_str"), " ")).as("word"),
        expr(s"unix_micros(ts) div ${w}L").as("slice"))
      .groupBy(col("word"), col("slice"))
      .agg(count(lit(1)).as("c"))
    val running = Window.partitionBy(col("word")).orderBy(col("slice"))
      .rangeBetween(-(slices - 1), Window.currentRow)
    perSlice.select(
      col("word"),
      timestamp_micros(col("slice") * w).as("slice_ts"),
      sum(col("c")).over(running).as("cnt"))
  }

  /** A3 + S10/S11 — per-partition offset bounds. min = the earliest
    * replayable offset (recovery default 0 / "earliest"), max = the head
    * offset a `startFromLatestKafkaOffset` consumer would seed from
    * (reference `…InputDStream.scala:153-175`, `KafkaUtils.scala:19-49`).
    */
  def offsetBounds(kafka: DataFrame): DataFrame =
    kafka.groupBy(col("partition").cast(LongType).as("kpartition"))
      .agg(
        min(col("offset")).as("min_offset"),
        max(col("offset")).as("max_offset"),
        count(lit(1)).as("n_records"))

  /** A4 — OffsetOutOfRange recovery: the smallest valid broker offset
    * strictly above the consumer's stale cursor, else 0
    * (reference `…InputDStream.scala:352-370`: `seq.find(_ > current)`
    * over the ascending offset list).
    */
  def firstOffsetAbove(kafka: DataFrame, current: Long): DataFrame =
    kafka.groupBy(col("partition").cast(LongType).as("kpartition"))
      .agg(coalesce(
        min(when(col("offset") > lit(current), col("offset"))),
        lit(0L)).as("recovered_offset"))

  /** Kafka `Consumer.offsetsForTimes` — per partition, the earliest
    * offset whose record timestamp is at-or-after the lookup time
    * (null when the partition has no such record, exactly the API's
    * null entry). One aggregation, map-side combined; at scale the
    * timestamp predicate prunes containers via the stats manifest
    * before a byte is decoded.
    */
  def offsetsForTimes(kafka: DataFrame, tsUs: Long): DataFrame =
    kafka.groupBy(col("partition").cast(LongType).as("kpartition"))
      .agg(min(when(expr("unix_micros(timestamp)") >= lit(tsUs),
        col("offset"))).as("first_offset_at_or_after"))

  /** A5 — throughput meter, batch analog: events/sec per partition per
    * hour bucket (reference per-partition EWMA `Meter.mark(consumed)`,
    * `…InputDStream.scala:101,228,387-389`).
    */
  def throughput(kafka: DataFrame): DataFrame =
    kafka
      .groupBy(
        col("partition").cast(LongType).as("kpartition"),
        window(col("timestamp"), "1 hour").as("win"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("kpartition"), col("win.start").as("hour_start"),
        col("cnt"),
        (col("cnt").cast(DoubleType) / lit(3600.0)).as("events_per_sec"))

  /** A5 — EWMA throughput meter: the reference's per-partition
    * exponentially-weighted rate (`Meter.mark(consumed)`, reference
    * `…InputDStream.scala:101,228,387-389`) in a deterministic batch
    * form. Per partition, the hourly events/sec series folds in hour
    * order through e_t = (e_{t-1} + r_t) / 2 — a fixed α = 1/2,
    * zero-seeded EWMA. The dyadic α makes every fold step one
    * correctly-rounded IEEE add + exact halving on exact inputs
    * (cnt/3600.0 is a single correctly-rounded division), so the
    * result is bit-identical across engines, partitionings and
    * summation orders. State per group is the hour list — bounded by
    * hours-per-partition, not data volume, so the collect_list is
    * safe at 100 TB (one struct per hour).
    */
  def throughputEwma(kafka: DataFrame): DataFrame = {
    // the hourly rate series IS throughput()'s output — build on it so
    // the two A5 meters can never disagree on the windowing/denominator
    val hourly = throughput(kafka)
      .select(col("kpartition"), col("hour_start"),
        col("events_per_sec").as("rate"))
    hourly.groupBy(col("kpartition"))
      .agg(sort_array(collect_list(struct(col("hour_start"), col("rate"))))
        .as("hr"))
      .select(col("kpartition"),
        size(col("hr")).cast(LongType).as("n_hours"),
        aggregate(col("hr"), lit(0.0),
          (acc, x) => (acc + x.getField("rate")) / lit(2.0))
          .as("ewma_rate"))
  }

  /** S1 multi-topic — per-topic stream stats over a multi-topic
    * subscription (reference `README.md:6-11`): record count, active
    * partition count, head offset per topic — one map-side-combined
    * aggregation however many topics the subscription spans.
    */
  def topicStats(kafka: DataFrame): DataFrame =
    kafka.groupBy(col("topic"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("partition")).as("n_partitions"),
        max(col("offset")).as("head_offset"))

  /** S5 — offset-range fetch: one microbatch's slice of the stream,
    * the half-open [from, until) range the reference's fetch executor
    * pulls per request (reference `KafkaUtils.scala:186-240`; offset
    * cursor advance at `…InputDStream.scala:304`). In Structured
    * Streaming this is the per-trigger (startOffset, endOffset] plan;
    * as a batch predicate it pushes to the parquet scan.
    */
  def offsetRangeSlice(kafka: DataFrame, from: Long, until: Long): DataFrame =
    kafka.filter(col("offset") >= from && col("offset") < until)

  /** M1 — stream union: the example merges N per-consumer shards into
    * one stream before aggregating (reference `KafkaWordCount.scala:53-68`,
    * `ssc.union(...)`). Semantics-preserving TEST form only: sharding
    * one scan N ways and unioning back deliberately reads the source N
    * times to prove shard∪shard == whole; a production union merges
    * genuinely distinct sources, so never ship this shape as a plan.
    */
  def unionShards(kafka: DataFrame, consumersCount: Int): DataFrame = {
    val shards = (0 until consumersCount).map { id =>
      kafka.filter(
        pmod(col("partition"), lit(consumersCount)) === lit(id))
    }
    shards.reduce(_.union(_))
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("partition")).as("n_partitions"))
  }

  /** Kafka log compaction, batch twin: keep only the highest-offset
    * record per (topic, partition, key) — the broker's
    * `cleanup.policy=compact` contract, which the reference relies on
    * for its offsets/monitor topics' latest-state reads. Runs through
    * the GroupedTopK custom operator (k=1): per-group state is ONE
    * retained row however deep the key's history, where the
    * `row_number()` window form would sort each key's full record
    * history — the difference between O(keys) and O(records·log n)
    * state on a compacted 100 TB topic.
    */
  def logCompact(decoded: DataFrame): DataFrame =
    graft.plans.GroupedTopK(decoded,
      Seq("topic", "kpartition", "key_str"),
      Seq(("koffset", false)), k = 1, rankName = "rnk")
}
