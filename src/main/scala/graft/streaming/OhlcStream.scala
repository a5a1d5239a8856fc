package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serving twin of [[graft.ops.TimeSeries.ohlcBars]]: the same
  * per-(hour, type) open/high/low/close/volume bars as an incremental
  * streaming aggregation. This twin exists BECAUSE the batch operator
  * was designed streaming-legal: open/close are `min_by`/`max_by` over
  * the (ts, event_id) struct — algebraic aggregates the state store
  * folds one candidate-per-group at a time — where the obvious
  * row_number formulation would be rejected by Structured Streaming
  * outright. State per group is five scalars + two (ts, id) witnesses,
  * bounded by (hours in the watermark horizon) × (event types), not by
  * events.
  *
  * With `watermarkDelay` set (append mode), a bar finalizes and emits
  * once the watermark passes its window end and its state is evicted —
  * the at-scale shape. Complete/update mode works too for dashboards
  * that want live partial bars.
  */
object OhlcStream {

  /** events: streaming frame with (ts, event_type, event_id, value).
    * Output schema matches TimeSeries.ohlcBars exactly.
    */
  def ohlcStream(events: DataFrame,
                 watermarkDelay: Option[String] = Some("1 hour")): DataFrame = {
    val marked = watermarkDelay.fold(events)(events.withWatermark("ts", _))
    marked
      .select(col("ts"), col("event_type"), col("event_id"),
        round(col("value") * 100).cast(LongType).as("c"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("c"), struct(col("ts"), col("event_id")))
          .as("open_cents"),
        max(col("c")).as("high_cents"),
        min(col("c")).as("low_cents"),
        max_by(col("c"), struct(col("ts"), col("event_id")))
          .as("close_cents"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_events"))
  }
}
