package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables
import graft.ops.Similarity

/** The GroupedTopK custom operator must (a) actually plan through
  * GroupedTopKExec via the injected strategy, and (b) be row-identical
  * to the window-function form on real data, including ties, small
  * groups (size < k), and multi-partition shuffles.
  */
class GroupedTopKSpec extends SparkSuite {

  test("plans through GroupedTopKExec") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("g", "v")
    val topk = GroupedTopK(df, Seq("g"), Seq("v" -> false), 1, "rk")
    // the physical node prints as "GroupedTopK [..." (SparkPlan strips
    // the Exec suffix); AQE's wrapper hides it from collect(), so
    // assert on the plan text
    val plan = topk.queryExecution.executedPlan.toString()
    assert(plan.contains("GroupedTopK [g#"), plan)
    assert(topk.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet == Set((1L, 20L, 1L), (2L, 5L, 1L)))
  }

  test("row-identical to the window form on sf0.01 embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") < 32)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val window = rows(Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = 5))
    val exec = rows(Similarity.bruteForceTopKExec(
      emb, queries, "vec_id", "embedding", k = 5))
    assert(exec == window)
  }

  test("RankLimitToGroupedTopK rewrites the row_number <= k idiom") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 100).map(i => (i % 7, i)).toDF("g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
    val windowForm = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    // the optimizer rewrote the pattern into the custom operator...
    assert(windowForm.queryExecution.optimizedPlan
      .collect { case g: GroupedTopK => g }.nonEmpty,
      windowForm.queryExecution.optimizedPlan.toString())
    // ...and the result equals the naive spec
    val got = windowForm.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val want = (1 to 100).map(i => (i % 7, i)).groupBy(_._1).toSeq
      .flatMap { case (g, vs) =>
        vs.map(_._2).sorted.reverse.take(3).zipWithIndex
          .map { case (v, i) => (g, v, i + 1) }
      }.toSet
    assert(got == want)
    // a window that is NOT a plain row_number rank filter is untouched
    val other = df.withColumn("s", sum(col("v")).over(w))
      .filter(col("s") > 10)
    assert(other.queryExecution.optimizedPlan
      .collect { case g: GroupedTopK => g }.isEmpty)
  }

  test("groups smaller than k emit all rows; ties break by order expr") {
    val s = spark
    import s.implicits._
    // group 7 has 2 rows (< k=3); group 8 has a tie on v broken by id
    val df = Seq((7L, 1L, 100L), (7L, 2L, 50L),
      (8L, 1L, 9L), (8L, 2L, 9L), (8L, 3L, 9L), (8L, 4L, 1L))
      .toDF("g", "id", "v")
    val got = GroupedTopK(df, Seq("g"),
      Seq("v" -> false, "id" -> true), 3, "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(got == Set((7L, 1L, 1L), (7L, 2L, 2L),
      (8L, 1L, 1L), (8L, 2L, 2L), (8L, 3L, 3L)))
  }
}
