package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** 2-D skyline (Pareto frontier, maximize both axes) — the classic
  * multi-criteria "best tradeoff" operator (price vs volume, quality
  * vs cost, recall vs latency): every point not dominated by another
  * point that is ≥ on both axes and strictly greater on at least one.
  *
  * Distributed shape — grid-pruned two-phase, NEVER the quadratic
  * dominance self-join (which is a cross join in disguise and the
  * oracle's job only):
  *  1. per-x reduction: only max(y) per x can be on the frontier
  *     (same x, lower y is dominated) — a map-side-combinable
  *     aggregate that collapses the input to ≤ |x-domain| candidates;
  *  2. grid prune: bucket x into ≤ `buckets` disjoint ranges, take
  *     max(y) per bucket (same aggregate shape), and compute each
  *     bucket's DOMINANCE THRESHOLD = max y over all strictly-higher
  *     buckets — a suffix-max over the ≤`buckets`-row census, read on
  *     the driver (value-domain-bounded like the BPE top-256 /
  *     k-means sample caps, never scaling with row count). A
  *     candidate in bucket b with y ≤ thr(b) is PROVEN dominated
  *     (every point in a higher bucket has strictly greater x), so
  *     only near-frontier candidates survive to the exact pass;
  *  3. exact pass: within each bucket, a window PARTITIONED BY BUCKET
  *     ordered x desc keeps a candidate iff its y exceeds the running
  *     max of all higher-x candidates in the bucket; cross-bucket
  *     dominance is exactly the threshold test of step 2, so the
  *     union of the two tests is the full dominance predicate.
  *
  * Two shuffles total (the per-x aggregate, the per-bucket window);
  * no global sort, no unpartitioned window, no pair join. At 100 TB
  * the grid prune is what matters: step 3's window sees only the
  * survivors, whose count is bounded by the frontier plus the top
  * occupied bucket's candidates — not the data.
  *
  * Both axes are read as BIGINT (callers pass integer cents/counts),
  * so dominance and the hash compare are exact.
  */
object Skyline {

  /** Frontier of `df` maximizing (`xCol`, `yCol`) jointly. Output:
    * one row per frontier coordinate, columns (xCol, yCol), exact and
    * deterministic (duplicates collapse: a coordinate appears once).
    */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val x: Column = col(xCol).cast(LongType)
    val y: Column = col(yCol).cast(LongType)
    // step 1 — per-x candidates, materialized ONCE (localCheckpoint):
    // the range read, the bucket census, and the prune each consume
    // this frame — without it the input scan + aggregate run three
    // times (measured 3× cost at sf0.1)
    val cand = df.select(x.as("x"), y.as("y"))
      .groupBy(col("x")).agg(max(col("y")).as("y"))
      .localCheckpoint()
    // bucket layout from the x range (two driver-read values)
    val rng = cand.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()
    if (rng.isEmpty || rng(0).isNullAt(0))
      return cand.select(col("x").as(xCol), col("y").as(yCol))
    val lo = rng(0).getLong(0)
    val hi = rng(0).getLong(1)
    val width = math.max(1L, (hi - lo) / buckets + 1L)
    // integer floor division (x ≥ lo, so div == floor) — no doubles
    val bucketed = cand.withColumn("b",
      expr(s"(x - ${lo}L) div ${width}L"))
    // step 2 — per-bucket max-y census (≤ `buckets` rows), suffix max
    val census = bucketed.groupBy(col("b")).agg(max(col("y")).as("by"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val thr = Array.newBuilder[(Long, Long)] // (bucket, max y above it)
    var run = Long.MinValue
    census.foreach { case (b, by) =>
      if (run != Long.MinValue) thr += ((b, run))
      run = math.max(run, by)
    }
    val thrDf = df.sparkSession
      .createDataFrame(thr.result().toSeq).toDF("b", "thr")
    val pruned = bucketed
      .join(broadcast(thrDf), Seq("b"), "left_outer")
      .filter(col("thr").isNull || col("y") > col("thr"))
    // step 3 — exact within-bucket pass (x is distinct after step 1,
    // so a rows frame over x desc sees exactly the higher-x rows)
    val w = Window.partitionBy(col("b")).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pruned
      .withColumn("rmax", max(col("y")).over(w))
      .filter(col("rmax").isNull || col("y") > col("rmax"))
      .select(col("x").as(xCol), col("y").as(yCol))
  }
}
