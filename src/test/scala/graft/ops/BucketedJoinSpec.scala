package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables

/** Bucketing: persisting both join sides bucketed on the join key lets
  * the join run co-located — NO exchange on either side. This is the
  * 100 TB strategy for repeated fact-fact joins (bucket once, join
  * many times); the test proves the plan property, not just the rows.
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed fact-fact join plans without a shuffle") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    s.sql("DROP TABLE IF EXISTS li_b")
    s.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(s, d).write.format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite")
      .saveAsTable("li_b")
    Tables.orders(s, d).write.format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite")
      .saveAsTable("ord_b")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join strategy must rely on bucketing
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("li_b")
        .join(s.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString()
      // bucketed: only the post-join aggregate may shuffle (1 exchange);
      // unbucketed the same plan carries 3 (both join inputs + agg)
      val exchanges = plan.linesIterator
        .count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 1,
        s"bucketed join must not shuffle its inputs ($exchanges):\n$plan")
      val expected = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1))
        .toMap
      assert(got == expected)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
