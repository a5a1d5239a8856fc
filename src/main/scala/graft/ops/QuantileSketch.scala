package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Mergeable histogram quantile sketch — the quantile member of the
  * sketch family beside the persisted HLL rows: at 100 TB you cannot
  * sort, but you CAN keep ~250 integer bucket counts per key that
  * merge by ADDITION across partitions, days, or stores, and answer
  * any quantile with a known relative-error bound.
  *
  * Buckets are HdrHistogram-shaped (public: Gil Tene's HdrHistogram;
  * same family as DDSketch's log buckets): for a positive integer
  * value c, bucket = 4·⌊log₂ c⌋ + the two bits after the leading one
  * (values < 4 map to themselves — QSketchImpl codegen kernel), so a
  * bucket spans [lb, 1.25·lb) and any value is within 25% of its
  * bucket's lower bound. The sketch IS the (key, bucket, cnt) frame:
  * pure exact integers, commutative/associative merge = one hash
  * aggregate — no floats, no order sensitivity, nothing to tune.
  *
  * [[quantiles]] answers p50/p90/p99 by exact rank selection over
  * the ≤ ~250 buckets per key: target rank ⌈q·n⌉ as the integer
  * (n·num + den − 1) div den; the answer is the LOWER BOUND of the
  * first bucket whose cumulative count reaches it — deterministic,
  * conservative (≤ the true quantile, within the bucket bound), and
  * replayed integer-for-integer by the oracle. The cumulative window
  * partitions by key over bucket-count rows — bounded by ~4·log₂ of
  * the value domain, never by data volume.
  */
object QuantileSketch {

  /** Build the sketch: (keyCols..., bucket, cnt). Merging sketches
    * is the same groupBy-sum over their union (spec-asserted). */
  def build(df: DataFrame, keyCols: Seq[String],
            valueCents: Column): DataFrame =
    df.select(keyCols.map(col) :+
        GraftFunctions.qBucket(valueCents).as("bucket"): _*)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Exact rank selection over a built sketch: per key, n plus the
    * conservative p50/p90/p99 lower-bound estimates (cents). */
  def quantiles(sketch: DataFrame, keyCols: Seq[String]): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(keyCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.partitionBy(keyCols.map(col): _*)
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    def sel(num: Long, den: Long): Column =
      min(when(col("cum") >=
        expr(s"(n * ${num}L + ${den - 1}L) div ${den}L"), col("lb")))
    sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("lb", GraftFunctions.qLower(col("bucket")))
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("n")).as("n"),
        sel(1L, 2L).as("p50"),
        sel(9L, 10L).as("p90"),
        sel(99L, 100L).as("p99"))
  }
}
