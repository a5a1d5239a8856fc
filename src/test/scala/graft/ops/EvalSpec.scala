package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSuite

class EvalSpec extends SparkSuite {

  private def auc(rows: Seq[(Long, Boolean)], parts: Int = 1): Double = {
    val s = spark
    import s.implicits._
    Eval.rankAuc(rows.toDF("score", "pos").repartition(parts),
      "score", col("pos")).collect().head.getAs[Double]("auc")
  }

  /** O(n²) reference: P(pos > neg) + ½ P(pos == neg). */
  private def brute(rows: Seq[(Long, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    u / (pos.size * neg.size)
  }

  test("perfect separation → 1.0; inverted → 0.0; all tied → 0.5") {
    assert(auc(Seq((10L, true), (9L, true), (1L, false))) == 1.0)
    assert(auc(Seq((1L, true), (9L, false), (10L, false))) == 0.0)
    assert(auc(Seq((5L, true), (5L, false), (5L, true))) == 0.5)
  }

  test("matches the O(n²) reference with heavy ties, layout-stable") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(400)((rnd.nextInt(12).toLong,
      rnd.nextInt(3) == 0))
    val want = brute(rows)
    assert(math.abs(auc(rows) - want) < 1e-12)
    assert(auc(rows, parts = 7) == auc(rows, parts = 1))
  }

  test("degenerate single-class input emits no row") {
    val s = spark
    import s.implicits._
    val out = Eval.rankAuc(
      Seq((1L, true), (2L, true)).toDF("score", "pos"), "score",
      col("pos")).collect()
    assert(out.isEmpty)
  }

  test("welchTTest: hand-computed t² on unequal variances") {
    val s = spark
    import s.implicits._
    // arm0 cents (100,200,300), arm1 (200,400,600):
    // μ=200 vs 400, v=10000 vs 40000 → t² = 200²/(50000/3) = 2.4
    val df = Seq(("g", 0L, 100L), ("g", 0L, 200L), ("g", 0L, 300L),
      ("g", 1L, 200L), ("g", 1L, 400L), ("g", 1L, 600L))
      .toDF("grp", "arm", "c")
    val out = Eval.welchTTest(df, "grp", "arm", col("c")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("mean_diff_cents") == -200.0)
    assert(r.getAs[Double]("t2") == 2.4)
  }

  test("welchTTest: missing or singleton arm and zero-variance " +
    "groups are filtered; layout-stable") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("only_a", 0L, 5L), ("only_a", 0L, 7L),
      ("single_b", 0L, 5L), ("single_b", 0L, 7L), ("single_b", 1L, 9L),
      ("const", 0L, 4L), ("const", 0L, 4L),
      ("const", 1L, 4L), ("const", 1L, 4L),
      ("ok", 0L, 1L), ("ok", 0L, 3L), ("ok", 1L, 9L), ("ok", 1L, 2L))
      .toDF("grp", "arm", "c")
    val out = Eval.welchTTest(df, "grp", "arm", col("c")).collect()
    assert(out.map(_.getString(0)).toSet == Set("ok"))
    val a = Eval.welchTTest(df.repartition(7), "grp", "arm", col("c"))
      .collect().map(_.toSeq).toSet
    assert(a == out.map(_.toSeq).toSet)
  }
}
