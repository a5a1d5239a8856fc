package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational breadth over the TPC-H-ish star schema (FIXTURES.md).
  * The reference has no relational layer (SURVEY.md §2 "explicitly
  * absent"); these prove the rebuild's scan→filter→join→agg paths with
  * plans that hold at 100 TB: dims broadcast, filters pushed to parquet,
  * aggregates map-side combined.
  *
  * Float discipline: monetary columns are 2-decimal values stored as
  * doubles, so every SUM goes through exact integer cents
  * (`round(x*100)::long`) and divides back at the end. Integer addition
  * is associative — the result is order-independent and bit-identical
  * across any shuffle layout and across engines (double addition is
  * not associative; a 32-way shuffle would otherwise produce
  * run-to-run jitter in the last ulp, and per-row double→decimal casts
  * round differently between engines).
  */
object Relational {

  /** Exact integer cents of a 2-decimal double column. */
  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** Order-independent SUM of a 2-decimal money column, as double. */
  private def dsum(c: Column): Column =
    sum(cents(c)).cast(DoubleType) / lit(100.0)

  /** Exact revenue sum: price_cents * (100 - discount_basis_points),
    * all int64, divided back to currency at the end.
    */
  private def revenueSum(price: Column, discount: Column): Column =
    sum(cents(price) * (lit(100L) - cents(discount))).cast(DoubleType) /
      lit(10000.0)

  private def chargeSum(price: Column, discount: Column, tax: Column): Column =
    sum(cents(price) * (lit(100L) - cents(discount)) *
      (lit(100L) + cents(tax))).cast(DoubleType) / lit(1000000.0)

  /** Data-quality audit gate (the pre-training "expectations" pass):
    * evaluate a declarative set of row-level constraints in ONE scan —
    * every check is a codegen'd boolean folded into a single
    * aggregate — plus optional key-uniqueness checks, and emit one
    * row per check: (check_name, n_rows, n_violations, pass). A row
    * where a predicate evaluates to NULL counts as a violation
    * (unknown fails the gate). `uniqueKeys` are PRIMARY-KEY checks:
    * violations = rows − count(distinct non-null key), so NULL keys
    * count as violations alongside duplicates. At 100 TB this is one
    * map over the data and a one-row aggregate, never a scan per
    * expectation; uniqueness rides the same aggregate as
    * count(distinct).
    */
  def dataAudit(df: DataFrame, checks: Seq[(String, Column)],
                uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty, "no checks given")
    val vio = checks.map { case (n, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$n")
    }
    val uniq = uniqueKeys.map(k =>
      (count(lit(1)) - count_distinct(col(k))).as(s"__u_$k"))
    val aggCols = vio ++ uniq :+ count(lit(1)).as("__n")
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    val rows =
      checks.map { case (n, _) =>
        struct(lit(n).as("check_name"),
          col(s"__v_$n").as("n_violations"))
      } ++ uniqueKeys.map(k =>
        struct(lit(s"unique:$k").as("check_name"),
          col(s"__u_$k").as("n_violations")))
    agg.select(col("__n").as("n_rows"), explode(array(rows: _*)).as("c"))
      .select(col("c.check_name").as("check_name"), col("n_rows"),
        col("c.n_violations").as("n_violations"),
        (col("c.n_violations") === 0L).as("pass"))
  }

  /** TPC-H Q1-style pricing summary: the canonical scan→filter→agg. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc_price"),
        chargeSum(col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))

  /** TPC-H Q3-style: top-10 unshipped orders by revenue for one segment.
    * Join order: lineitem ⋈ (orders ⋈ customer-filter). No broadcast
    * HINT on the customer side: customer SCALES with the data (1/5th
    * of it after the segment filter — a forced broadcast is a driver
    * OOM at TPC-H petabyte scale); AQE broadcasts it while it fits
    * and shuffle-joins on the shared key beyond.
    * Ties broken by orderkey so the limit is deterministic.
    */
  def topOrders(lineitem: DataFrame, orders: DataFrame,
                customer: DataFrame): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = orders
      .filter(col("o_orderdate") < lit("1998-03-15").cast(TimestampType))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    lineitem
      .filter(col("l_shipdate") > lit("1998-03-15").cast(TimestampType))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation inside one region/date window.
    * nation/region are fixed-cardinality dims; the customer chain
    * SCALES, so it carries no broadcast hint (AQE broadcasts while it
    * fits, shuffle-joins beyond); only lineitem⋈orders shuffles, on
    * the join key both sides already share.
    */
  def regionRevenue(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, nation: DataFrame,
                    region: DataFrame): DataFrame = {
    val dims = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    val ord = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_name"))
    lineitem
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Anti join: customers with no order since a cutoff (NOT EXISTS).
    * At scale a shuffled left-anti on the customer key; orders side
    * filtered (pushed to the scan) and pre-projected to the single
    * join column so only keys move. The date window keeps the result
    * non-empty on the fixture, so the anti-join path is actually
    * exercised by the correctness gate.
    */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
                             since: String = "1998-01-01"): DataFrame =
    customer
      .join(orders
        .filter(col("o_orderdate") >= lit(since).cast(TimestampType))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast(LongType).as("c_nationkey"))

  /** Semi join: suppliers in nations that have at least one BUILDING
    * customer (EXISTS), dims broadcast.
    */
  def suppliersInActiveNations(supplier: DataFrame,
                               customer: DataFrame): DataFrame =
    supplier.join(
      broadcast(customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey").as("nk")).distinct()),
      col("s_nationkey") === col("nk"), "left_semi")
      .select(col("s_suppkey"), col("s_name"),
        col("s_nationkey").cast(LongType).as("s_nationkey"))

  /** Window functions: top-3 parts per brand by retail price
    * (rank over a partitioned sort; ties broken by partkey).
    */
  def topPartsPerBrand(part: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    part.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("p_brand"), col("rk").cast(LongType).as("rk"),
        col("p_partkey"), col("p_retailprice"))
  }

  /** ROLLUP: hierarchical subtotals (flag, status) → flag → grand total.
    * One shuffle; Spark expands grouping sets map-side.
    */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** Correlated-aggregate filter: orders whose lineitem count exceeds a
    * threshold (HAVING over a keyed agg, then join back to orders —
    * both sides partitioned by the same key).
    */
  def bigOrders(lineitem: DataFrame, orders: DataFrame,
                minLines: Long = 6): DataFrame = {
    val counts = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .filter(col("n_lines") >= minLines)
    orders.join(counts, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("n_lines"))
  }

  /** Conditional aggregation (TPC-H Q12 shape, keyed by ship month —
    * the fixture carries no ship mode): per month, how many high- vs
    * low-priority lineitems shipped — the pivot-by-predicate pattern,
    * one join on the shared key + one shuffle with map-side combine.
    */
  def shipMonthPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))

  /** Exact discrete quantiles per group, deterministic: element at
    * rank ceil(q·n) under a total (value, key) order — windowed
    * selection, no collect, one shuffle on the group key. Values in
    * integer cents so the result is engine-exact (approximate sketches
    * like percentile_approx trade this exactness for memory; here n
    * per group is bounded so the sort-based exact form is the right
    * plan, and the definition is replayed verbatim in the oracle).
    */
  def priceQuantiles(orders: DataFrame): DataFrame = {
    val pc = cents(col("o_totalprice"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("pc"), col("o_orderkey"))
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
    orders.select(col("o_orderpriority"), pc.as("pc"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("rn") === ceil(lit(0.5) * col("n")), col("pc")))
          .as("p50_cents"),
        max(when(col("rn") === ceil(lit(0.9) * col("n")), col("pc")))
          .as("p90_cents"))
  }

  /** Distribution drift between two snapshots of a metric, per group:
    * add-one-smoothed chi-square over a FIXED bucket grid — the
    * feature-drift monitor (PSI's χ² cousin) a training pipeline runs
    * between data refreshes, kept bit-exact instead of log-based:
    * with per-bucket counts r_b (reference) and o_b (current),
    * smoothed r' = r+1, o' = o+1 and totals R' = R+nB, C' = C+nB,
    * each term is (o'·R' − c'·C')² / (r'·C'·R') — every factor an
    * exact integer below 2^53, so each term costs exactly two IEEE
    * roundings and the 8-term sum folds left-to-right over the fixed
    * bucket order (the bm25 association discipline). Buckets observed
    * in NEITHER snapshot contribute nothing (smoothing applies only to
    * observed buckets). Two shuffles (bucket counts, group pivot);
    * flags at the χ²(df=7, 0.99) ≈ 18.48 critical value.
    */
  def distributionDrift(ref: DataFrame, cur: DataFrame, groupCol: String,
                        valCol: String, bucketWidthCents: Long = 5000L,
                        nBuckets: Int = 8,
                        threshold: Double = 18.48): DataFrame = {
    def bucketed(df: DataFrame, cnt: String) = df
      .select(col(groupCol),
        least(lit(nBuckets - 1),
          expr(s"CAST(round($valCol * 100) AS BIGINT) " +
            s"DIV $bucketWidthCents")).as("b"))
      .groupBy(col(groupCol), col("b")).agg(count(lit(1)).as(cnt))
    val r = bucketed(ref, "r")
    val o = bucketed(cur, "o")
    val grid = r.join(o, Seq(groupCol, "b"), "full_outer")
      .select(col(groupCol), col("b"),
        coalesce(col("r"), lit(0L)).as("r"),
        coalesce(col("o"), lit(0L)).as("o"))
    val totals = grid.groupBy(col(groupCol))
      .agg((sum(col("r")) + nBuckets).as("rt"),
        (sum(col("o")) + nBuckets).as("ot"))
    val terms = grid.join(broadcast(totals), groupCol)
      .withColumn("num",
        ((col("o") + 1) * col("rt")).cast(DoubleType)
          - ((col("r") + 1) * col("ot")).cast(DoubleType))
      .withColumn("den",
        ((col("r") + 1) * col("ot") * col("rt")).cast(DoubleType))
      .withColumn("term", col("num") * col("num") / col("den"))
    val perBucket = (0 until nBuckets).map(i =>
      coalesce(max(when(col("b") === i, col("term"))), lit(0.0))
        .as(s"t_$i"))
    val chi = terms.groupBy(col(groupCol))
      .agg(perBucket.head, perBucket.tail: _*)
      .withColumn("chi2",
        (0 until nBuckets).map(i => col(s"t_$i")).reduceLeft(_ + _))
    chi.join(broadcast(totals), groupCol)
      .select(col(groupCol), (col("rt") - nBuckets).as("n_ref"),
        (col("ot") - nBuckets).as("n_cur"), col("chi2"),
        (col("chi2") > threshold).as("drifted"))
  }

  /** Incremental view maintenance: fold a CDC changelog into a
    * persisted (count, sum) aggregate WITHOUT rescanning the base
    * facts — the materialized-view delta-apply every warehouse runs
    * nightly, and the only shape that survives when the base table is
    * 100 TB and the day's changes are gigabytes. Changelog rows are
    * (key, op ∈ I|U|D, old_cents, new_cents): I contributes (+1,
    * +new), D (−1, −old), U (0, new−old). Deltas aggregate at
    * changelog size, then ONE outer join keyed by the group column
    * merges them into the summary; groups whose count reaches zero
    * drop (their row disappears, exactly as a recompute would).
    * Pure integer arithmetic — maintained == recomputed bit-for-bit,
    * which is precisely what the oracle asserts.
    */
  def maintainAggregate(summary: DataFrame, changelog: DataFrame,
                        keyCol: String): DataFrame = {
    val deltas = changelog.select(col(keyCol),
        when(col("op") === "I", 1L).when(col("op") === "D", -1L)
          .otherwise(0L).as("dn"),
        (coalesce(col("new_cents"), lit(0L))
          - coalesce(col("old_cents"), lit(0L))).as("dv"))
      .groupBy(col(keyCol)).agg(sum("dn").as("dn"), sum("dv").as("dv"))
    summary.join(deltas, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n_events"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_events"),
        (coalesce(col("sum_cents"), lit(0L)) + coalesce(col("dv"), lit(0L)))
          .as("sum_cents"))
      .filter(col("n_events") > 0)
  }

  /** Robust per-group outlier flags: lower-median + MAD (median
    * absolute deviation), |x − med| > k·MAD — the monitoring-pipeline
    * anomaly pass that survives heavy-tailed metrics where a
    * mean/stddev z-score is dragged by the outliers it's hunting.
    *
    * Medians are the LOWER median (the element at rank (n+1) div 2 of
    * the within-group sort), never the interpolated midpoint: a
    * selected element is bit-identical across engines, while a+(b−a)/2
    * vs (a+b)/2 interpolation formulas differ in IEEE rounding. Both
    * medians are one window pass each (row_number + count over the
    * group); group frames join back broadcast (group cardinality is
    * the dimension's, not the fact's). At 100 TB the within-group sort
    * is the cost — swap in percentile_approx (see priceQuantilesApprox)
    * when the exact flag boundary stops mattering.
    */
  def robustAnomalies(df: DataFrame, groupCol: String, valCol: String,
                      k: Double = 3.0): DataFrame = {
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col(c))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol))
      in.select(col(groupCol), col(c))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) DIV 2"))
        .select(col(groupCol), col(c).as(out))
    }
    val med = lowerMedian(df, valCol, "med")
    val withDev = df.join(broadcast(med), groupCol)
      .withColumn("adev", abs(col(valCol) - col("med")))
    val mad = lowerMedian(withDev, "adev", "mad")
    withDev.join(broadcast(mad), groupCol)
      .withColumn("is_anom", col("adev") > lit(k) * col("mad"))
  }

  /** Running z-score anomaly flags — the STREAMING-shaped form of
    * anomaly detection (each event judged against the history BEFORE
    * it, flag-then-update), as a batch window query. Stats are exact
    * integer cents: with prior (n, s=Σx, q=Σx²), |x−μ| > k·σ is
    * cross-multiplied to (x·n − s)² > k²·(n·q − s²) — no division, no
    * sqrt, evaluated in DECIMAL(38,0) so the squares never overflow
    * and the flag is bit-identical in any engine. Warm-up: no flag
    * before `minPrior` prior events. One window pass per group ordered
    * by (tsCol, idCol) — a total order, so replay-stable.
    * [[graft.streaming.AnomalyStream]] is the serving twin: identical
    * fold as per-key transformWithState state, stream == batch.
    */
  def runningAnomalies(events: DataFrame, groupCol: String,
                       valCol: String, tsCol: String, idCol: String,
                       k: Int = 3, minPrior: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    events
      .select(col(groupCol), col(tsCol), col(idCol),
        cents(col(valCol)).as("x"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("q", sum(expr("x * x")).over(w))
      .withColumn("is_anom",
        col("n") >= minPrior &&
          expr(s"CAST(x * n - s AS DECIMAL(38,0)) " +
            s"* CAST(x * n - s AS DECIMAL(38,0)) " +
            s"> ${k * k} * (CAST(n AS DECIMAL(38,0)) " +
            s"* CAST(q AS DECIMAL(38,0)) " +
            s"- CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))"))
  }

  /** Set difference: customers active in year A but not in year B.
    * Dataset.except plans as a left-anti over pre-projected key sets —
    * one shuffle per side on the key, no wide rows move.
    */
  def churnedCustomers(orders: DataFrame, yearA: Int = 1996,
                       yearB: Int = 1998): DataFrame = {
    def active(y: Int) = orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    active(yearA).except(active(yearB))
  }

  /** Pivot: per topic partition, event counts spread across the fixed
    * event-type vocabulary. An explicit value list keeps the pivot a
    * single pass (no extra distinct-values job) with map-side-combined
    * counts — the plan shape that survives any corpus size.
    */
  def eventTypePivot(events: DataFrame,
                     types: Seq[String] = Seq("click", "error", "purchase",
                       "signup", "view"),
                     numPartitions: Int = 8): DataFrame =
    events
      .select((col("user_id") % numPartitions.toLong).as("kpartition"),
        col("event_type"))
      .groupBy(col("kpartition"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("kpartition") +:
        types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  /** Snapshot diff — the table-diff primitive behind incremental
    * pipeline re-runs: classify every key across two snapshots as
    * added / removed / changed / unchanged. One full-outer equi-join on
    * the key (both sides shuffle once on `key`; at scale the usual
    * refinement is bucketing both snapshots on the key so the join is
    * shuffle-free — BucketedJoinSpec shows that path). Null-safe:
    * presence is tracked with marker columns and values compare with
    * `<=>`, so a legitimately-null metric is not mistaken for a
    * missing row.
    *
    * Column contract: both inputs carry `key` plus the same metric
    * columns; metrics appear in the output twice, prefixed `old_` /
    * `new_`.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   key: String): DataFrame = {
    val metrics = oldSnap.columns.filterNot(_ == key).toSeq
    val o = oldSnap.select(col(key) +:
      metrics.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__old"): _*)
    val n = newSnap.select(col(key) +:
      metrics.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__new"): _*)
    // foldLeft: a key-only diff (no metric columns) is a legitimate
    // presence-only added/removed classification, not an error
    val changed = metrics
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .foldLeft(lit(false))(_ || _)
    o.join(n, Seq(key), "full_outer")
      .withColumn("status",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__old", "__new")
  }

  /** N9 — CDC apply: collapse an ordered upsert/delete changelog into
    * final table state. The latest row per key wins (GroupedTopK k=1:
    * a bounded-heap per-group pass — ONE shuffle on the key, no
    * global or per-partition sort), then keys whose winning op
    * satisfies `isDelete` are tombstoned out of the result. This is
    * the batch twin of applying a Debezium-style change feed to a
    * snapshot; `logCompact` (StreamOps.scala) is its keep-tombstones
    * sibling, exactly as broker log compaction retains deletes until
    * the retention pass.
    */
  def cdcApply(changelog: DataFrame, keys: Seq[String], seqCol: String,
               isDelete: org.apache.spark.sql.Column): DataFrame =
    graft.plans.GroupedTopK(changelog, keys,
      Seq((seqCol, false)), k = 1, rankName = "__rnk")
      .filter(!isDelete)
      .drop("__rnk")

  /** Robust-stats audit — winsorization report: per group, the exact
    * p01/p99 order statistics of integer cents and how many rows each
    * tail clip would touch — the outlier-clipping feature transform's
    * dry run (MAD's quantile sibling; `robustAnomalies` flags points,
    * this sizes the clip). Ranks are pure integer arithmetic,
    * ceil(q·n) = (q·100·n + 99) div 100 — no float quantile math to
    * drift between engines — and the order statistic is read off a
    * per-group row_number window ((cents, seq) order: the unique seq
    * makes tie placement deterministic, and the value AT a rank is
    * tie-insensitive anyway). One window pass + one broadcast join of
    * the per-group quantile frame (bounded by group cardinality).
    */
  def winsorizeStats(events: DataFrame, groupCol: String,
                     seqCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("c"), col(seqCol))
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val r = events
      .select(col(groupCol), cents(col("value")).as("c"), col(seqCol))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(cw))
    val q = r.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 99) div 100"), col("c")))
          .as("p01_cents"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"), col("c")))
          .as("p99_cents"))
    r.join(broadcast(q.drop("n")), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        max(col("p01_cents")).as("p01_cents"),
        max(col("p99_cents")).as("p99_cents"),
        sum(when(col("c") < col("p01_cents"), 1L).otherwise(0L))
          .as("n_clip_lo"),
        sum(when(col("c") > col("p99_cents"), 1L).otherwise(0L))
          .as("n_clip_hi"))
  }

  /** Privacy audit — k-anonymity census: group rows into equivalence
    * classes over the quasi-identifier columns and report the class-
    * size distribution (n_classes, n_rows per size, risky = size < k).
    * The release gate a training-data publisher runs before shipping
    * user-derived records: every row in a risky class is re-
    * identifiable to within `size` candidates. Two hash aggregates —
    * classes, then the size histogram (bounded by distinct sizes) —
    * nothing keyed finer than the class tuple ever shuffles.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 k: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("risky", col("class_size") < k.toLong)

  /** Differentially-private count release — the disclosure trio's
    * OUTPUT side: after k-anonymity/l-diversity/t-closeness audit the
    * raw table, this is the histogram you can actually publish. The
    * geometric mechanism (public: Ghosh, Roughgarden & Sundararajan
    * 2009 — the discrete, utility-optimal Laplace): per cell, release
    * count + (g₁ − g₂) where g₁, g₂ are iid Geometric(1/2), giving the
    * two-sided geometric noise of a discrete Laplace at ε = ln 2.
    *
    * Everything is EXACT INTEGER arithmetic — no ln, no floats, no
    * RNG state: the per-cell randomness is the oracle-identical
    * 31-polynomial hash of the cell key, Knuth-scrambled to 32 bits;
    * g₁ counts the trailing one-bits of the low 16, g₂ of the high 16
    * (a run of k ones then a zero has probability 2^-(k+1) — a
    * geometric draw read straight off the bits). The tail is capped
    * at 16 (mass 2·2⁻¹⁶ ≈ 3e-5 — the standard bounded-geometric
    * release; cap hits are astronomically rare and deterministic).
    * Seeded-hash noise makes the release REPRODUCIBLE — the property
    * a published dataset needs (re-running the pipeline must not
    * re-randomize the noise) — at the usual cost that the seed is part
    * of the privacy budget. Output: one row per cell with ONLY the
    * noisy count — the true count never leaves.
    *
    * Shape: one hash aggregate to cells, then stateless per-cell maps;
    * nothing finer than the cell tuple ever shuffles.
    */
  def dpCounts(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    // Geometric(1/2) from the trailing one-bits of a 16-bit field:
    // g = k iff (b mod 2^(k+1)) == 2^k - 1; exhaustive CASE ladder,
    // all-ones caps at 16.
    def geo(b: Column): Column = {
      var c = when(pmod(b, lit(2L)) === 0L, lit(0L))
      (1 until 16).foreach { k =>
        c = c.when(pmod(b, lit(1L << (k + 1))) === lit((1L << k) - 1L),
          lit(k.toLong))
      }
      c.otherwise(lit(16L))
    }
    val key = concat_ws(":",
      keyCols.map(c => col(c).cast(StringType)): _*)
    val u = pmod(graft.functions.GraftFunctions
      .polyHash(key, TextOps.FpMod) * lit(2654435761L),
      lit(4294967296L))
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__u", u)
      .select(keyCols.map(col) :+
        (col("__n") + geo(col("__u")) - geo(shiftright(col("__u"), 16)))
          .as("dp_count"): _*)
  }

  /** l-diversity audit — [[kAnonymity]]'s sibling for ATTRIBUTE
    * disclosure (public: Machanavajjhala et al. 2007): a class can be
    * k-anonymous yet leak the sensitive column when every row in it
    * shares one value (l = 1). Per quasi-identifier equivalence
    * class, the number of DISTINCT sensitive values, reported as the
    * same census histogram shape as kAnonymity: (l, n_classes,
    * n_rows, risky = l < threshold). Two hash aggregates; the first
    * keys on the quasi columns (class cardinality), the distinct
    * count is per-class exact.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("l_div"),
        count(lit(1)).as("class_size"))
      .groupBy(col("l_div"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("risky", col("l_div") < l.toLong)

  /** t-closeness audit — the third of the disclosure trio with
    * [[kAnonymity]] and [[lDiversity]] (public: Li, Li &
    * Venkatasubramanian 2007): a class can be l-diverse yet leak when
    * its sensitive-value DISTRIBUTION diverges from the global one
    * (e.g. a class that is 90% one diagnosis in a 10% population).
    * Distance = the paper's equal-ground-distance EMD, i.e. total
    * variation: ½·Σ_v |p_class(v) − p_global(v)|.
    *
    * Exact arithmetic: with class size n, global size N, the per-value
    * term is |cnt·N − gcnt·n| (integer), and TV = Σ / (2·n·N) — ONE
    * division per class, so the doubles hash-compare. The global
    * distribution is a driver census bounded by the sensitive DOMAIN
    * (the bm25-stats precedent) and rides into the plan as a literal
    * array exploded per class — never a cross join.
    *
    * Output: one row per quasi-identifier class with its size, tv,
    * and risky = tv > t.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    val global = df.groupBy(col(sensitiveCol)).count()
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val bigN = global.map(_._2).sum
    val dom = typedLit(global)
    val cls = df.groupBy(quasiCols.map(col) :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("cnt"))
    val q = quasiCols.map(col)
    cls.groupBy(q: _*)
      .agg(sum(col("cnt")).as("class_size"),
        map_from_entries(collect_list(
          struct(col(sensitiveCol).cast("string"), col("cnt"))))
          .as("m"))
      .select(q ++ Seq(col("class_size"), col("m"),
        explode(dom).as("g")): _*)
      .select(q ++ Seq(col("class_size"),
        abs(coalesce(element_at(col("m"), col("g._1")), lit(0L))
          * lit(bigN) - col("g._2") * col("class_size")).as("d")): _*)
      .groupBy(q :+ col("class_size"): _*)
      .agg(sum(col("d")).as("num"))
      .select(q ++ Seq(col("class_size"),
        (col("num").cast(DoubleType) /
          (lit(2.0) * col("class_size").cast(DoubleType) * lit(
            bigN.toDouble))).as("tv")): _*)
      .withColumn("risky", col("tv") > t)
  }

  /** Fixed-horizon LTV: mean cumulative spend in a user's first
    * h days, for each horizon, averaged over EXACTLY the users whose
    * observation window covers the horizon (maxDay − firstDay ≥ h−1)
    * — the day-7/day-30 revenue curve every growth team tracks, with
    * the censoring handled by cohort-eligibility filtering instead of
    * the dense per-age grid (which at 10^9 users × ages would dwarf
    * the fact table). Fixed horizons, not a full curve: the curve's
    * dense form needs a per-user age grid; three spot horizons need
    * one conditional sum each.
    *
    * Shape: one per-user min(day) aggregate, one user-keyed join
    * back (no broadcast — user cardinality), one aggregate with h
    * conditional integer sums, then a horizon-exploded roll-up
    * (h× user-rows, h ≤ 3). maxDay is a one-row census (the bm25
    * stats precedent). Exact cents; one division per horizon row.
    */
  def ltvHorizons(events: DataFrame,
                  horizons: Seq[Int] = Seq(7, 14, 30)): DataFrame = {
    require(horizons.nonEmpty && horizons == horizons.distinct)
    val e = events.select(col("user_id"),
      expr("unix_micros(ts) div 86400000000L").as("day"),
      round(col("value") * 100).cast(LongType).as("c"))
    val maxDay = e.agg(max(col("day"))).head.getLong(0)
    val firsts = e.groupBy(col("user_id")).agg(min(col("day")).as("f"))
    val perUser = e.join(firsts, Seq("user_id"))
      .groupBy(col("user_id"), col("f"))
      .agg(horizons.map(h =>
        sum(when(col("day") < col("f") + h.toLong, col("c"))
          .otherwise(0L)).as(s"__s$h")).head,
        horizons.tail.map(h =>
          sum(when(col("day") < col("f") + h.toLong, col("c"))
            .otherwise(0L)).as(s"__s$h")): _*)
    perUser
      .select(col("f"), explode(array(horizons.map(h =>
        struct(lit(h.toLong).as("horizon"),
          col(s"__s$h").as("cents"))): _*)).as("x"))
      .select(col("f"), col("x.horizon").as("horizon"),
        col("x.cents").as("cents"))
      .where(lit(maxDay) - col("f") >= col("horizon") - 1L)
      .groupBy(col("horizon"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("sum_cents"))
      .select(col("horizon"), col("n_users"), col("sum_cents"),
        (col("sum_cents").cast(DoubleType) /
          col("n_users").cast(DoubleType)).as("avg_cents"))
  }

  /** Join-key profiling — referential containment of a child key in a
    * parent key: distinct child keys, how many resolve in the parent,
    * the containment ratio (1.0 = a clean foreign key), and how many
    * CHILD ROWS are orphaned. The schema-discovery / ingest-quality
    * check run before trusting a join at 100 TB — a 0.94 containment
    * means 6% of facts silently vanish from every inner join. Shape
    * (r14): per-key child counts FIRST (one map-side-combined shuffle
    * of distinct keys — guide §2.3 "aggregate before you shuffle"),
    * left-joined to distinct parent keys; both countDistincts become
    * plain counts over the already-distinct key frame, so the old
    * plan's two-distinct Expand (2× the child rows through the final
    * aggregate) and the all-rows join disappear. Outputs identical:
    * n_orphan_rows folds the per-key row counts of unmatched keys
    * (null child keys match nothing, exactly as before).
    */
  def fkProfile(child: DataFrame, childCol: String, parent: DataFrame,
                parentCol: String, label: String): DataFrame =
    child.groupBy(col(childCol).as("ck"))
      .agg(count(lit(1)).as("n_rows"))
      .join(parent.select(col(parentCol).as("pk")).distinct(),
        col("ck") === col("pk"), "left") // both sides distinct → no fanout
      .agg(count(col("ck")).as("n_child_keys"),
        count(col("pk")).as("n_matched_keys"),
        sum(when(col("pk").isNull, col("n_rows")).otherwise(0L))
          .as("n_orphan_rows"))
      .select(lit(label).as("fk"), col("n_child_keys"),
        col("n_matched_keys"),
        (col("n_matched_keys").cast(DoubleType) /
          col("n_child_keys").cast(DoubleType)).as("containment"),
        col("n_orphan_rows"))

  /** Pre-flight join cardinality + skew profile — the EXACT numbers a
    * planner estimates: output rows = Σ_k c_left(k)·c_right(k), the
    * hottest key and its contribution. Run before committing a 100 TB
    * join: out_rows ≫ max(inputs) means key fanout (a disguised
    * many-to-many), and max_contrib ≈ out_rows means one key owns the
    * join — reach for [[graft.ops.Skew.saltedJoin]] (skew_report's
    * per-key histogram decides the salt width).
    *
    * Shape: per-key COUNT aggregates on each side (map-side combined,
    * one shuffle of distinct keys each), then counts-frame inner join
    * + one scalar fold — per-join cost is O(distinct keys), raw rows
    * are never joined. All outputs exact BIGINTs.
    */
  def joinSizeProfile(left: DataFrame, leftKey: String,
                      right: DataFrame, rightKey: String,
                      label: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("k"))
      .agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(rightKey).as("k"))
      .agg(count(lit(1)).as("cr"))
    lc.join(rc, "k")
      .select(col("k"), col("cl"), col("cr"),
        (col("cl") * col("cr")).as("contrib"))
      .agg(count(lit(1)).as("n_shared_keys"),
        sum(col("cl")).as("n_left_matched"),
        sum(col("cr")).as("n_right_matched"),
        sum(col("contrib")).as("out_rows"),
        max(col("contrib")).as("max_contrib"),
        max_by(col("k"), struct(col("contrib"), col("k")))
          .as("hottest_key"))
      .select(lit(label).as("join_name"), col("n_shared_keys"),
        col("n_left_matched"), col("n_right_matched"),
        col("out_rows"), col("max_contrib"), col("hottest_key"))
  }

  /** N9 — SCD type-2 build: turn a change feed into a VERSIONED
    * dimension — every change opens a version row valid over
    * [valid_from, valid_to), the last version per key open-ended
    * (valid_to NULL). The point-in-time lookup this enables ("what
    * was the value when the fact happened") is what `AsOf.asOfJoin`
    * probes; this operator is how the probed side gets built from raw
    * changes in the first place.
    *
    * Shape: one window over (key) ordered by (ts, seqCol) — the
    * per-key sort is the inherent cost of interval construction, and
    * it partitions by key, so 1000 executors each sort only their
    * keys' history; no global sort. The unique `seqCol` tie-break
    * makes version numbering deterministic when one key changes twice
    * in the same tick (the earlier seq's version is closed by the
    * later one, possibly zero-length — a faithful record, not an
    * error).
    */
  def scdType2(changelog: DataFrame, keyCol: String, tsCol: String,
               seqCol: String, valueCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("valid_from"), col(seqCol))
    changelog
      .select(col(keyCol) +: col(tsCol).as("valid_from") +:
        col(seqCol) +: valueCols.map(col): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("version_n", row_number().over(w).cast(LongType))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(seqCol)
  }

  /** TPC-H Q21-shaped "only late supplier" (adapted to this fixture's
    * columns: late = shipped more than 60 days after the order date,
    * the receipt/commit pair isn't generated): among finished ('F')
    * MULTI-supplier orders, count per supplier the orders where that
    * supplier was the ONLY late shipper — the classic nested
    * EXISTS / NOT EXISTS correlated-subquery pattern.
    *
    * Shape: the AGGREGATE REWRITE, not the textbook double self-join —
    * one pass computes per-order (distinct suppliers, distinct LATE
    * suppliers), and "S is the only late supplier of a ≥2-supplier
    * order" becomes a filter on that aggregate joined back to the
    * late rows. Kills both O(lineitems²-per-order) self-joins; every
    * join is keyed, top-20 by (numwait DESC, suppkey) runs as
    * TakeOrderedAndProject.
    */
  def q21OnlyLateSupplier(lineitem: DataFrame, orders: DataFrame,
                          supplier: DataFrame,
                          lateDays: Int = 60): DataFrame = {
    val li = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > date_add(col("o_orderdate"), lateDays))
          .as("late"))
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey")))
          .as("n_late_supp"))
    li.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .join(perOrder.filter(col("n_supp") >= 2L &&
        col("n_late_supp") === 1L), "l_orderkey")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Trimmed mean per group — the robust location estimate between the
    * mean (outlier-dragged) and the median (throws away 98% of the
    * data): drop the lowest and highest ⌊n·trim⌋ values under the
    * total (cents, tiebreak) order, average the rest. The standard
    * robust KPI for spend/latency style metrics where a few extreme
    * rows shouldn't move the number but the bulk should.
    *
    * Exactness: rank selection under a written-down total order
    * (PARTITIONED windows — per-group sort, no global sort), kept
    * values summed as exact BIGINT cents, ONE division. trim is
    * applied as an integer count k = n·numer div denom, identical in
    * both engines.
    */
  def trimmedMean(df: DataFrame, groupCol: String, valueCents: Column,
                  tieCol: String, trimNumer: Long = 1L,
                  trimDenom: Long = 10L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wRank = W.partitionBy(col("g"))
      .orderBy(col("c"), col("tb"))
    val wN = W.partitionBy(col("g"))
    df.select(col(groupCol).as("g"), valueCents.cast(LongType).as("c"),
        col(tieCol).as("tb"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("k", expr(s"(n * ${trimNumer}L) div ${trimDenom}L"))
      .where(col("rn") > col("k") && col("rn") <= col("n") - col("k"))
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("k")).as("n_trimmed_each"),
        count(lit(1)).as("n_kept"), sum(col("c")).as("kept_cents"))
      .select(col("g").as(groupCol), col("n"), col("n_trimmed_each"),
        col("n_kept"), col("kept_cents"),
        (col("kept_cents").cast(DoubleType) /
          col("n_kept").cast(DoubleType)).as("trimmed_mean_cents"))
  }

  /** RFM segmentation — the classic marketing/behavior census: each
    * user scored 1..5 on Recency (days since last event at a FIXED
    * reference second — reproducible, the decayScore rule), Frequency
    * (event count) and Monetary (total cents), then users counted per
    * (r, f, m) cell. Score 5 = best (most recent / most frequent /
    * highest spend).
    *
    * Scoring is VALUE-CENSUS quintile binning, not per-row ntile:
    * each metric is quantized (recency to whole days, frequency as-is,
    * monetary to whole dollars), the census of distinct quantized
    * values gets cumulative counts over one bounded unpartitioned
    * window (bounded by the QUANTIZATION GRID — calendar days,
    * plausible per-user counts, dollar buckets — never by user
    * count), and a value's bin is the quintile of its FIRST row under
    * the (value, tie-free) total order: bin = (cum_before·5) div n.
    * Users tied on a metric value land in the same bin by
    * construction (deterministic, engine-exact, no per-row tiebreak
    * needed), which is the honest semantics for a segmentation. All
    * integers end to end; the oracle replays the same formula.
    */
  def rfmSegments(events: DataFrame, refEpochSec: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val per = events.groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        sum(cents(col("value"))).as("cts"))
      .select(col("user_id"),
        expr(s"(${refEpochSec}L * 1000000L - last_us) div 86400000000L")
          .as("rec_days"),
        col("freq"), col("cts"), expr("cts div 10000L").as("dollars_h"))
    // per-metric value census → quintile of the group's first row;
    // `asc` = larger value ⇒ higher bin ⇒ used for F/M (more = best),
    // descending input (recency: smaller = best) passes asc = false
    def bins(metric: String, asc: Boolean): DataFrame = {
      val ord = if (asc) col(metric).asc else col(metric).desc
      val wc = W.orderBy(ord)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val census = per.groupBy(col(metric)).agg(count(lit(1)).as("cnt"))
      census
        .withColumn("cum_end", sum(col("cnt")).over(wc))
        .withColumn("n", sum(col("cnt")).over(
          W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
        .select(col(metric),
          (expr("((cum_end - cnt) * 5L) div n") + 1L)
            .as(s"${metric}_score"))
    }
    per
      .join(broadcast(bins("rec_days", asc = false)), "rec_days")
      .join(broadcast(bins("freq", asc = true)), "freq")
      .join(broadcast(bins("dollars_h", asc = true)), "dollars_h")
      .groupBy(col("rec_days_score").as("r_score"),
        col("freq_score").as("f_score"),
        col("dollars_h_score").as("m_score"))
      .agg(count(lit(1)).as("n_users"), sum(col("cts")).as("sum_cents"))
  }

  /** Daily new-vs-returning split — the acquisition/retention pulse
    * line of every product dashboard: per day, how many DISTINCT
    * active users were seen for the first time that day vs seen
    * before. First-touch day is a per-user min (one hash aggregate),
    * the active set a per-(day, user) distinct (second aggregate);
    * the classifying join is user-keyed. No windows, all counts.
    */
  def newVsReturning(events: DataFrame): DataFrame = {
    val byDay = events
      .select(expr("unix_micros(ts) div 86400000000L").as("day"),
        col("user_id"))
      .distinct()
    val first = byDay.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    byDay.join(first, "user_id")
      .groupBy(col("day"))
      .agg(sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
        .as("new_users"),
        sum(when(col("day") === col("first_day"), 0L).otherwise(1L))
          .as("returning_users"))
  }
}
