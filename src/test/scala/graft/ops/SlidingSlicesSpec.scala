package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The reference's true 2-second-slide word count
  * (`reduceByKeyAndWindow(_+_, _-_, Minutes(10), Seconds(2), 2)`) in
  * slice-aggregated relational form: per-(word, 2s-slice) counts plus a
  * bounded per-word RANGE window. Two contracts: the running count is
  * exactly the brute-force "occurrences in the trailing 10 minutes",
  * and the plan contains NO Expand (the 300-projection blow-up the
  * formulation exists to avoid) and no global-order window.
  */
class SlidingSlicesSpec extends SparkSuite {

  private def decoded = {
    val s = spark
    import s.implicits._
    // words scattered across slices, including gaps wider than the
    // window so the RANGE bound (not a ROWS bound) is what's tested:
    // "cat" at slices 0,1,299,300,301,9000; "dog" at 0 and 600
    val rows = Seq(
      (0L, "cat dog"), (1L, "cat"), (299L, "cat"),
      (300L, "cat cat"), (301L, "cat"), (9000L, "cat"),
      (600L, "dog"))
    rows.toDF("slice", "value_str")
      .select(col("value_str"),
        timestamp_micros(col("slice") * 2000000L).as("ts"))
  }

  test("running count equals brute-force trailing-10-minute count, " +
    "window retirement included") {
    val got = StreamOps.wordCountSlidingSlices(decoded)
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getLong(2))).toSet
    def t(slice: Long) = new Timestamp(slice * 2000L)
    // trailing window = slices [s-299, s]; "cat" at 300 retires slice 0
    val want = Set(
      ("cat", t(0), 1L), ("cat", t(1), 2L), ("cat", t(299), 3L),
      ("cat", t(300), 4L),   // 1,299,300,300 in range; slice 0 retired
      ("cat", t(301), 4L),   // 299,300,300,301; slice 1 retired
      ("cat", t(9000), 1L),  // far gap: everything retired
      ("dog", t(0), 1L), ("dog", t(600), 1L))
    assert(got == want)
  }

  test("plan has no Expand and no global-order window") {
    val plan = StreamOps.wordCountSlidingSlices(decoded)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Expand"),
      s"slice aggregation must not plan an Expand:\n$plan")
    // the RANGE window must be partitioned by word — a window with an
    // empty partition spec collapses to a single partition at scale
    assert(!plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("partitionBy=[]")),
      s"running-sum window must be partitioned:\n$plan")
  }
}
