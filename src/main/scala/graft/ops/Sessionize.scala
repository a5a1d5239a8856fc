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

  /** Top-k session paths: the most common event-type sequences
    * (truncated to the first `pathLen` steps) across sessions — the
    * "how do users actually move through the product" report behind
    * every path-analysis / Sankey view. Sessions use the same
    * gaps-and-islands assignment as [[gapsAndIslands]]; each session
    * folds to one path string (sort_array over the unique
    * (ts, event_id) order makes the fold shuffle-proof), then a hash
    * count + TakeOrderedAndProject top-k — per-partition partial
    * top-k, no global sort of the path universe.
    */
  def topPaths(events: DataFrame, gapSeconds: Long = 1800,
               pathLen: Int = 5, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >=
            gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("h"))
      .select(concat_ws(">",
        slice(transform(col("h"), _.getField("event_type")),
          1, pathLen)).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }

  /** Time-constrained ordered funnel (the windowFunnel of product
    * analytics): per user, the deepest prefix of `steps` completed IN
    * ORDER with every step inside `windowUs` of its anchor (first
    * step) occurrence; output is the depth histogram. Every anchor
    * occurrence is tried and the user takes the max depth — greedy
    * earliest-next-step per anchor is optimal because the only
    * deadline is the anchor's window, so taking the earliest
    * candidate can never hurt.
    *
    * Built by CHAINING [[AsOf.asofJoinForward]]: step i+1's events
    * forward-join onto step i's resolved timestamp per anchor — each
    * chain link is one merge-shaped join keyed by user, so the whole
    * funnel is `steps.size − 1` shuffles, never a per-user
    * quadratic expansion (the DuckDB oracle runs exactly that n²
    * formulation for the cross-check). Anchors whose chain dies early
    * carry nulls forward and fall out at the depth fold.
    */
  /** The shared funnel chain: per DISTINCT anchor (user, t0), the
    * earliest time of each subsequent step at-or-after the previous
    * step's resolved time — one as-of-forward join per link, nulls
    * carried forward for anchors whose chain dies.
    */
  private def funnelChain(events: DataFrame,
                          steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    def ofType(t: String, tsName: String) =
      events.filter(col("event_type") === t)
        .select(col("user_id"), unix_micros(col("ts")).as(tsName),
          col("event_id"))
    // distinct anchors: two same-instant anchor events describe the
    // same span (the oracle's GROUP BY (user, t0) contract)
    var cur: DataFrame = ofType(steps.head, "t0").drop("event_id")
      .distinct()
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      cur = AsOf.asofJoinForward(
        ofType(st, s"t${i + 1}"), cur, "user_id",
        s"t${i + 1}", s"t$i", "event_id").drop("event_id")
    }
    cur
  }

  def windowFunnel(events: DataFrame, steps: Seq[String],
                   windowUs: Long): DataFrame = {
    val cur = funnelChain(events, steps)
    val depth = (1 until steps.size).foldLeft(lit(1L)) { (acc, i) =>
      // prefix conjunction: step i counts only if every earlier step
      // landed inside the anchor window
      val ok = (1 to i).map(j =>
        col(s"t$j").isNotNull &&
          col(s"t$j") <= col("t0") + lit(windowUs))
        .reduce(_ && _)
      acc + when(ok, 1L).otherwise(0L)
    }
    cur.select(col("user_id"), depth.as("depth"))
      .groupBy(col("user_id")).agg(max(col("depth")).as("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("n_users"))
  }

  /** CEP-style pattern EXTRACTION (the MATCH_RECOGNIZE-lite sibling of
    * [[windowFunnel]]): emit one row per COMPLETED match — every
    * distinct anchor whose full step chain lands inside `windowUs` —
    * with the matched timestamps, instead of the depth histogram.
    * The row-level artifact downstream joins hang on ("which signup
    * converted, and when was each step"), where windowFunnel only
    * reports how many.
    *
    * Same chain, same greedy-earliest-per-anchor optimality argument,
    * same `steps.size − 1` merge-shaped joins — the match filter is a
    * pure predicate on the chained frame, so extraction costs exactly
    * what the histogram costs.
    */
  def patternSpans(events: DataFrame, steps: Seq[String],
                   windowUs: Long): DataFrame = {
    val cur = funnelChain(events, steps)
    val complete = (1 until steps.size).map(j =>
      col(s"t$j").isNotNull &&
        col(s"t$j") <= col("t0") + lit(windowUs))
      .reduce(_ && _)
    cur.where(complete)
      .select(col("user_id") +:
        (0 until steps.size).map(i => col(s"t$i")): _*)
  }

  /** Peak concurrent sessions per day — the capacity-planning gauge
    * over the sessionization output, as a two-level sweep line.
    *
    * The naive sweep (order every session boundary globally, running
    * sum) is a single-task sort of 2×sessions rows — the global-window
    * plan killer. Instead the boundaries are first aggregated to
    * MINUTE-grain net deltas (+1 at the session's start minute, −1 the
    * minute after its last event; one hash aggregate, map-side
    * combined), so the running sum runs over a CALENDAR-bounded frame:
    * at most one row per minute of retention regardless of data volume
    * (a month is ≤ 44 640 rows at any scale — the cumulative_users
    * justification for the unpartitioned window). Sessions crossing
    * midnight are handled by construction: the running sum is global
    * over the month, only the final max groups by day.
    *
    * Within-minute churn note: a session starting and ending inside
    * the same minute contributes to that minute's peak (start lands at
    * minute m, the −1 at m+1), so the gauge reads "sessions live at
    * any instant of the minute" — the conservative capacity number.
    */
  def peakConcurrency(events: DataFrame,
                      gapSeconds: Long = 1800): DataFrame = {
    val sess = gapsAndIslands(events, gapSeconds)
    val starts = sess.select(
      expr("unix_micros(sess_start) div 60000000L").as("minute"),
      lit(1L).as("delta"))
    val ends = sess.select(
      (expr("unix_micros(sess_end) div 60000000L") + 1L).as("minute"),
      lit(-1L).as("delta"))
    val perMinute = starts.unionByName(ends)
      .groupBy(col("minute")).agg(sum(col("delta")).as("delta"))
    // calendar-bounded frame (see scaladoc) — pinned in the
    // PlanQualitySpec unpartitioned-window allowlist
    val w = Window.orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perMinute.withColumn("live", sum(col("delta")).over(w))
      .groupBy(expr("minute div 1440L").as("day_idx"))
      .agg(max(col("live")).as("peak_concurrent"))
  }

  /** Market-basket association rules with SESSIONS as baskets
    * (Agrawal-Srikant support/confidence/lift, public) — "users who
    * click in a session also purchase in it?": for every unordered
    * type pair, co-occurrence support, both conditional confidences,
    * and lift against independence. The behavioral-association
    * sibling of [[topPaths]] (which keeps order) and copurchase_topk
    * (whose baskets are orders).
    *
    * Shape: the [[gapsAndIslands]] session stamp (per-user window),
    * ONE distinct to (user, sess, type) — so the within-session
    * self-join is bounded by the TYPE VOCABULARY per session, never
    * by events — then type-keyed counts; the per-type frame is
    * vocabulary-sized and broadcast. n_sessions comes from one
    * count pre-pass (the bm25 stats precedent). Every ratio is one
    * division (lift: one product each side) of exact BIGINTs.
    */
  def sessionAssoc(events: DataFrame, gapSeconds: Long = 1800,
                   minSupport: Long = 2L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val st = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >=
            gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .select(col("user_id"), col("sess_id"), col("event_type"))
      .distinct()
    val nSessions =
      st.select(col("user_id"), col("sess_id")).distinct().count()
    val single = st.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"))
    val a = st.select(col("user_id"), col("sess_id"),
      col("event_type").as("type_a"))
    val b = st.select(col("user_id"), col("sess_id"),
      col("event_type").as("type_b"))
    a.join(b, Seq("user_id", "sess_id"))
      .where(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
      .join(broadcast(single.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), Seq("type_a"))
      .join(broadcast(single.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"), lit(nSessions).as("n_sessions"),
        (col("n_ab").cast(DoubleType) / lit(nSessions).cast(DoubleType))
          .as("support"),
        (col("n_ab").cast(DoubleType) / col("n_a").cast(DoubleType))
          .as("conf_a_to_b"),
        (col("n_ab").cast(DoubleType) / col("n_b").cast(DoubleType))
          .as("conf_b_to_a"),
        ((col("n_ab") * lit(nSessions)).cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType)).as("lift"))
  }
}
