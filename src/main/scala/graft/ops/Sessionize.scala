package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N6 — sessionization of the events stream: split each user's events
  * into sessions separated by ≥ gap of inactivity.
  *
  * Two forms with identical semantics:
  *  - gaps-and-islands (lag + running sum) — the SQL-oracle-checkable
  *    batch form; one shuffle on user_id, windows sorted within
  *    partition (Spark sorts per-key runs, no global sort).
  *  - `session_window` — Spark's native session operator, identical
  *    output on the same gap; the streaming twin (state-store backed,
  *    watermark-bounded) is exercised in tests.
  */
object Sessionize {

  /** Batch gaps-and-islands. New session when the time since the
    * previous event is >= gap (matches session_window's half-open
    * [start, last+gap) merge rule).
    */
  def gapsAndIslands(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val marked = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= gapSeconds * 1000000L,
          1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col("user_id"), col("sess_id"))
      .agg(
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"),
        count(lit(1)).as("n_events"))
  }

  /** Native session_window form; emits the same (user, start, n) rows
    * as gapsAndIslands (end differs by construction: session_window's
    * end = last_ts + gap).
    */
  def sessionWindow(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("n_events"))
}
