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

  test("calibrationBins: equi-width deciles, exact per-bin means " +
    "and rates") {
    val s = spark
    import s.implicits._
    // scores 0..19 → width 20, bin = s div 2; label = s >= 10
    val df = (0L until 20L).map(v => (v, v >= 10L)).toDF("score", "pos")
    val out = Eval.calibrationBins(df, "score", col("pos"))
      .collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("mean_score"), r.getAs[Double]("pos_rate"))))
      .toMap
    assert(out.size == 10)
    (0L until 10L).foreach { k =>
      val (n, np, ms, pr) = out(k)
      assert(n == 2L && ms == 2.0 * k + 0.5)
      assert(np == (if (k >= 5) 2L else 0L))
      assert(pr == (if (k >= 5) 1.0 else 0.0))
    }
  }

  test("calibrationBins: empty input emits no rows") {
    val s = spark
    import s.implicits._
    val out = Eval.calibrationBins(
      Seq.empty[(Long, Boolean)].toDF("score", "pos"), "score",
      col("pos")).collect()
    assert(out.isEmpty)
  }

  test("bootstrapCi matches a scala replay of the deterministic " +
    "Poisson weights; constant values degenerate to a point") {
    val s = spark
    import s.implicits._
    val t = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L)
    def w(id: Long, rep: Long): Long = {
      val x = id * 32 + rep
      val b31 = (x % 2147483648L + x / 2147483648L) % 2147483648L
      val u = (b31 * 2654435761L) % 4294967296L
      t.count(u >= _).toLong
    }
    val rows = (0 until 100).map(i => ("g", i.toLong, (i % 17).toLong * 10L))
    val df = rows.toDF("grp", "id", "c")
    val reps = (0L until 32L).flatMap { rep =>
      val sw = rows.map { case (_, id, _) => w(id, rep) }.sum
      val swc = rows.map { case (_, id, c) => w(id, rep) * c }.sum
      if (sw > 0) Some(swc.toDouble / sw.toDouble) else None
    }.sorted
    val loRank = (reps.size + 19) / 20
    val wantLo = reps(loRank - 1)
    val wantHi = reps(reps.size - loRank)
    val out = Eval.bootstrapCi(df, "grp", "id", col("c")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_events") == 100L)
    assert(r.getAs[Long]("n_resamples") == reps.size.toLong)
    assert(r.getAs[Double]("ci_lo_cents") == wantLo)
    assert(r.getAs[Double]("ci_hi_cents") == wantHi)
    assert(r.getAs[Double]("ci_lo_cents") <=
      r.getAs[Double]("ci_hi_cents"))

    // constant target → every resample mean equals the value
    val const = (0 until 50).map(i => ("k", i.toLong, 700L))
      .toDF("grp", "id", "c")
    val cr = Eval.bootstrapCi(const, "grp", "id", col("c")).collect().head
    assert(cr.getAs[Double]("mean_cents") == 700.0)
    assert(cr.getAs[Double]("ci_lo_cents") == 700.0)
    assert(cr.getAs[Double]("ci_hi_cents") == 700.0)
  }

  test("bootstrapCi is partitioning-insensitive") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val df = (0 until 400).map(i =>
      (s"t${i % 3}", i.toLong, rnd.nextInt(5000).toLong))
      .toDF("grp", "id", "c")
    val a = Eval.bootstrapCi(df, "grp", "id", col("c"))
      .collect().map(_.toSeq).toSet
    val b = Eval.bootstrapCi(df.repartition(11), "grp", "id", col("c"))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 3)
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

  test("giniGrouped: uniform is 0, one-holder is (n-1)/n, hand case; " +
      "benford literals cover digits 1-9") {
    val s = spark
    import s.implicits._
    def gini(xs: Seq[Long]): Double =
      Eval.giniGrouped(xs.toDF("v"), "v").collect().head.getDouble(2)
    assert(gini(Seq(5L, 5L, 5L, 5L)) == 0.0)
    assert(gini(Seq(0L, 0L, 0L, 4L)) == 0.75)
    // hand: (1,2,3,4): 2*sum(i*x) = 2*(1+4+9+16)=60; (60-5*10)/(4*10)
    assert(gini(Seq(1L, 2L, 3L, 4L)) == 0.25)
    // ties collapse to value groups and midranks keep it exact
    assert(gini(Seq(1L, 1L, 3L, 3L)) == gini(Seq(1L, 1L, 3L, 3L)))
    val bf = Eval.benfordAudit(
        (1L to 999L).toDF("v"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1..999: each digit leads 1 + 10 + 100 = 111 times
    assert(bf == (1L to 9L).map(_ -> 111L).toMap)
    // concentration: boundary INSIDE a tie group is apportioned by
    // integer count — 10 rows of (9 x value-1, 1 x value-11), top 20%
    // = 2 rows = the 11 plus ONE of the ones → (11+1)/20
    val conc = Eval.concentration(
        (Seq.fill(9)(1L) :+ 11L).toDF("v"), "v", Seq(20))
      .collect().head
    assert(conc.getLong(1) == 2L && conc.getLong(2) == 12L &&
      conc.getLong(3) == 20L && conc.getDouble(4) == 0.6)
  }

  test("contingencyLift: hand-computed cells; independence gives " +
      "lift 1; no cartesian in the plan") {
    val s = spark
    import s.implicits._
    // x=a always pairs with y=1 (perfect dependence); x=b spreads
    val df = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L))
      .toDF("x", "y")
    val out = Eval.contingencyLift(df, "x", "y")
    val got = out.collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got(("a", 1L)) == ((2L, 2L, 3L, 4L, 2.0 * 4 / (2 * 3))))
    assert(got(("b", 1L)) == ((1L, 2L, 3L, 4L, 1.0 * 4 / (2 * 3))))
    assert(got(("b", 2L)) == ((1L, 2L, 1L, 4L, 1.0 * 4 / (2 * 1))))
    // independent columns: every cell's lift is exactly 1.0
    val ind = (for (x <- Seq("p", "q"); y <- 1L to 3L; _ <- 1 to 2)
      yield (x, y)).toDF("x", "y")
    val lifts = Eval.contingencyLift(ind, "x", "y")
      .select("lift").collect().map(_.getDouble(0))
    assert(lifts.length == 6 && lifts.forall(_ == 1.0))
    // the grand-total join must be a hash join, never nested-loop
    val bad = out.queryExecution.executedPlan.collect {
      case p if p.nodeName.toLowerCase.contains("nestedloop") ||
        p.nodeName.toLowerCase.contains("cartesian") => p
    }
    assert(bad.isEmpty)
  }

  test("kaplanMeier: textbook worked example with censoring") {
    val s = spark
    import s.implicits._
    // 6 subjects: events at t=1 (1), t=3 (2); censored at t=2, t=4;
    // one more event at t=5
    val df = Seq(
      (1L, true), (2L, false), (3L, true), (3L, true), (4L, false),
      (5L, true)
    ).toDF("dur", "ev")
    val got = graft.ops.Eval.kaplanMeier(df, "dur", "ev")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList.sortBy(_._1)
    // t=1: n=6, d=1 → S = 5/6
    // t=2: censoring only (no step)
    // t=3: n=4, d=2 → S = 5/6 · 2/4 = 5/12
    // t=4: censoring only
    // t=5: n=1, d=1 → S = 0
    assert(got.map(g => (g._1, g._2, g._3)) ==
      List((1L, 6L, 1L), (3L, 4L, 2L), (5L, 1L, 1L)))
    assert(math.abs(got(0)._4 - 5.0 / 6.0) < 1e-12)
    assert(math.abs(got(1)._4 - 5.0 / 12.0) < 1e-12)
    assert(got(2)._4 == 0.0)
  }

  test("kaplanMeier: no censoring reduces to the empirical survivor " +
      "function; all-censored yields no steps") {
    val s = spark
    import s.implicits._
    val plain = Seq((1L, true), (2L, true), (2L, true), (4L, true))
      .toDF("dur", "ev")
    val got = graft.ops.Eval.kaplanMeier(plain, "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toList
      .sortBy(_._1)
    assert(got.map(_._1) == List(1L, 2L, 4L))
    assert(math.abs(got(0)._2 - 0.75) < 1e-12)
    assert(math.abs(got(1)._2 - 0.25) < 1e-12)
    assert(got(2)._2 == 0.0)
    val cens = Seq((1L, false), (2L, false)).toDF("dur", "ev")
    assert(graft.ops.Eval.kaplanMeier(cens, "dur", "ev").count() == 0)
  }

  test("binaryPrf: hand-worked confusion; degenerate all-negative " +
      "predictions emit 0.0, not NaN") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // tp=3 fp=1 fn=2 tn=4: p=0.75, r=0.6, f1=2*.45/1.35 = 2/3
    val rows = (Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false))
      ++ Seq.fill(2)((false, true)) ++ Seq.fill(4)((false, false)))
      .toDF("p", "t")
    val r = graft.ops.Eval.binaryPrf(rows, col("p"), col("t")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((3L, 1L, 2L, 4L)))
    assert(r.getDouble(5) == 0.75 && r.getDouble(6) == 0.6)
    assert(r.getDouble(7) == 2.0 * (0.75 * 0.6) / (0.75 + 0.6))
    val none = Seq((false, true), (false, false)).toDF("p", "t")
    val rn = graft.ops.Eval.binaryPrf(none, col("p"), col("t")).head()
    assert(rn.getDouble(5) == 0.0 && rn.getDouble(7) == 0.0)
  }

  test("classifierAgreement: perfect agreement gives kappa 1; " +
      "independence gives 0; hand-worked McNemar") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // perfect agreement, balanced
    val perfect = (Seq.fill(5)((true, true, true)) ++
      Seq.fill(5)((false, false, false))).toDF("a", "b", "t")
    val rp = graft.ops.Eval.classifierAgreement(perfect, col("a"),
      col("b"), col("t")).head()
    assert(rp.getLong(1) == 10L && rp.getDouble(2) == 1.0)
    assert(rp.getDouble(5) == 0.0)
    // independent raters: each cell 25 → kappa exactly 0
    val ind = (for { a <- Seq(true, false); b <- Seq(true, false);
      _ <- 1 to 25 } yield (a, b, a)).toDF("a", "b", "t")
    assert(graft.ops.Eval.classifierAgreement(ind, col("a"),
      col("b"), col("t")).head().getDouble(2) == 0.0)
    // McNemar: a right/b wrong 6 times, reverse 2 → (6-2)²/8 = 2
    val mc = (Seq.fill(6)((true, false, true)) ++
      Seq.fill(2)((false, true, true)) ++
      Seq.fill(4)((true, true, true))).toDF("a", "b", "t")
    val rm = graft.ops.Eval.classifierAgreement(mc, col("a"),
      col("b"), col("t")).head()
    assert(rm.getLong(3) == 6L && rm.getLong(4) == 2L)
    assert(rm.getDouble(5) == 2.0)
  }

  test("medianCi: hand-worked interval on 1..25; CI brackets the " +
      "median and widens as n shrinks") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // n=25: median rank 13 → 13; lo = floor((25 - 1.96*5)/2) = 7
    // → ci = [x(7), x(19)] = [7, 19]
    val rows = (1L to 25L).map(("a", _)).toDF("g", "v")
    val r = graft.ops.Eval.medianCi(rows, "g", col("v")).head()
    assert(r.getLong(1) == 25L && r.getLong(2) == 13L)
    assert(r.getLong(3) == 7L && r.getLong(4) == 19L)
    // tiny group: lo clamps to 1 → CI spans the whole sample
    val tiny = (1L to 3L).map(("b", _)).toDF("g", "v")
    val t = graft.ops.Eval.medianCi(tiny, "g", col("v")).head()
    assert(t.getLong(2) == 2L && t.getLong(3) == 1L &&
      t.getLong(4) == 3L)
  }

  test("rankStability: identical orders give tau = 1, reversal -1, " +
      "hand-worked ties") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // entities a,b,c with h1 counts 3,2,1; same order in h2 → tau 1
    def mk(h1: Seq[(String, Int)], h2: Seq[(String, Int)]) =
      (h1.flatMap { case (e, k) => Seq.fill(k)((e, true)) } ++
        h2.flatMap { case (e, k) => Seq.fill(k)((e, false)) })
        .toDF("e", "h1")
    val same = mk(Seq(("a", 3), ("b", 2), ("c", 1)),
      Seq(("a", 30), ("b", 20), ("c", 10)))
    val r1 = graft.ops.Eval.rankStability(same, "e", col("h1"), 100)
      .head()
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 3L)
    assert(r1.getLong(2) == 3L && r1.getLong(3) == 0L)
    assert(r1.getDouble(4) == 1.0)
    // reversed second half → tau -1
    val rev = mk(Seq(("a", 3), ("b", 2), ("c", 1)),
      Seq(("a", 10), ("b", 20), ("c", 30)))
    assert(graft.ops.Eval.rankStability(rev, "e", col("h1"), 100)
      .head().getDouble(4) == -1.0)
    // a y-tie removes one pair from the y denominator:
    // h2 counts (5, 5, 1): pairs ab tied in y → conc 2, t2 = 1,
    // tau = 2 / sqrt(3 * 2)
    val tie = mk(Seq(("a", 3), ("b", 2), ("c", 1)),
      Seq(("a", 5), ("b", 5), ("c", 1)))
    val rt = graft.ops.Eval.rankStability(tie, "e", col("h1"), 100)
      .head()
    assert(rt.getLong(2) == 2L && rt.getLong(3) == 0L)
    assert(rt.getDouble(4) == 2.0 / math.sqrt(3.0 * 2.0))
  }

  test("twoProportionZ: textbook pooled z² on a hand case; equal " +
      "rates give exactly 0") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // arm0: 4/10 convert, arm1: 1/10: num = 4*10-1*10 = 30,
    // z2 = 30²*20 / (10*10*5*15) = 18000/7500 = 2.4
    val rows = (Seq.fill(4)((0L, true)) ++ Seq.fill(6)((0L, false)) ++
      Seq.fill(1)((1L, true)) ++ Seq.fill(9)((1L, false)))
      .toDF("arm", "c")
    val r = graft.ops.Eval.twoProportionZ(rows, col("arm"),
      col("c")).head()
    assert(r.getLong(0) == 10L && r.getLong(2) == 4L &&
      r.getLong(3) == 1L)
    assert(r.getDouble(4) == 0.4 && r.getDouble(5) == 0.1)
    assert(r.getDouble(6) == 2.4)
    val same = (Seq.fill(2)((0L, true)) ++ Seq.fill(2)((0L, false)) ++
      Seq.fill(2)((1L, true)) ++ Seq.fill(2)((1L, false)))
      .toDF("arm", "c")
    assert(graft.ops.Eval.twoProportionZ(same, col("arm"), col("c"))
      .head().getDouble(6) == 0.0)
  }

  test("quantileTreatment: exact per-arm medians and differences on " +
      "a hand case; identical arms give zero QTE everywhere") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // arm A values {10,20,30}: p50=20; arm B {10,40}: p50 at
    // rank ceil(3/2)... B n=2 → rank (2+1)//2=1 → p50=10
    val rows = Seq((true, 10L), (true, 20L), (true, 30L),
      (false, 10L), (false, 40L)).toDF("a", "v")
    val r = graft.ops.Eval.quantileTreatment(rows, col("a"),
      col("v")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 20L && r.getLong(3) == 10L &&
      r.getLong(4) == -10L)
    // p99 = max element for tiny n
    assert(r.getLong(8) == 30L && r.getLong(9) == 40L &&
      r.getLong(10) == 10L)
    val same = Seq((true, 5L), (false, 5L), (true, 9L), (false, 9L))
      .toDF("a", "v")
    val rs = graft.ops.Eval.quantileTreatment(same, col("a"),
      col("v")).head()
    assert(rs.getLong(4) == 0L && rs.getLong(7) == 0L &&
      rs.getLong(10) == 0L)
  }

  test("anovaF: hand-worked two-group case; equal groups give F = 0") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // g0: {0,2}, g1: {10,12} → SSB = 100, SSW = 4, F = 50
    val rows = Seq((0L, 0L), (0L, 2L), (1L, 10L), (1L, 12L))
      .toDF("g", "c")
    val r = graft.ops.Eval.anovaF(rows, col("g"), col("c")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 100.0 && r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 50.0)
    val flat = Seq((0L, 1L), (0L, 3L), (1L, 1L), (1L, 3L))
      .toDF("g", "c")
    assert(graft.ops.Eval.anovaF(flat, col("g"), col("c"))
      .head().getDouble(4) == 0.0)
  }

  test("mutualInfo: independence gives exactly 0; a deterministic " +
      "mapping gives ln 2 within the series tolerance") {
    val s = spark
    import s.implicits._
    val ind = (for { x <- Seq("a", "b"); y <- Seq(0L, 1L);
      _ <- 1 to 25 } yield (x, y)).toDF("x", "y")
    val r0 = graft.ops.Eval.mutualInfo(ind, "x", "y").head()
    assert(r0.getLong(0) == 100L && r0.getLong(1) == 4L)
    assert(r0.getDouble(2) == 0.0)
    val dep = (Seq.fill(50)(("a", 0L)) ++ Seq.fill(50)(("b", 1L)))
      .toDF("x", "y")
    val r1 = graft.ops.Eval.mutualInfo(dep, "x", "y").head()
    assert(math.abs(r1.getDouble(2) - math.log(2.0)) < 1e-9)
  }

  test("conformalInterval: exact-fit train makes residuals pure " +
      "noise; hand-worked q_hat and coverage") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // train (id%3==0): y = 10*x1 exactly, full-rank design
    // calib (==1): residuals 0,2,4,6 → n_cal=4, k=ceil(0.9*5)=5>4 →
    //   q_hat = 6; test (==2): residuals 3 (in) and 100 (out) → 0.5
    val rows = Seq(
      (0L, 1L, 0L, 10L), (3L, 2L, 0L, 20L), (6L, 1L, 1L, 10L),
      (9L, 3L, 2L, 30L),
      (1L, 1L, 0L, 10L), (4L, 1L, 0L, 12L), (7L, 1L, 0L, 14L),
      (10L, 1L, 0L, 16L),
      (2L, 1L, 0L, 13L), (5L, 1L, 0L, 110L))
      .toDF("id", "x1", "x2", "y")
    val r = graft.ops.Eval.conformalInterval(rows, "id", col("y"),
      col("x1"), col("x2"), col("id") % 3L).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L &&
      r.getLong(2) == 2L)
    assert(r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == 0.5)
  }

  test("mixEntropy: single-type entities score 0, a uniform 2-type " +
      "mix scores ln 2 within the series tolerance") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a")).toDF("u", "t")
    val got = graft.ops.Eval.mixEntropy(rows, "u", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L)._1 == 4L && got(1L)._2 == 2L)
    assert(math.abs(got(1L)._3 - math.log(2.0)) < 1e-9)
    assert(got(2L) == ((3L, 1L, 0.0)))
  }

  test("overdispersion: constant counts give fano 0; hand-computed " +
      "clumped case") {
    val s = spark
    import s.implicits._
    // type x: users with counts 2,2,2 → var 0; type y: counts 1,5
    // → mean 3, var = (2*26 - 36)/2 = 8, fano = 8/3
    val rows =
      (1 to 3).flatMap(u => Seq.fill(2)(("x", u.toLong))) ++
        Seq(("y", 10L)) ++ Seq.fill(5)(("y", 11L))
    val got = graft.ops.Eval.overdispersion(rows.toDF("t", "u"),
        "t", "u")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got("x") == ((3L, 2.0, 0.0, 0.0)))
    assert(got("y")._1 == 2L && got("y")._2 == 3.0)
    assert(got("y")._3 == 8.0)
    assert(math.abs(got("y")._4 - 8.0 / 3.0) < 1e-15)
  }

  test("ebSmooth: light entities collapse to the pooled prior, heavy " +
      "entities keep their rate; exact hand case") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // u1: 1/1 conv; u2: 0/99. pooled p = 1/100
    val rows = (Seq((1L, true)) ++ Seq.fill(99)((2L, false)))
      .toDF("u", "conv")
    val got = graft.ops.Eval.ebSmooth(rows, "u", col("conv"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got(1L)._3 == 1.0)
    // u1 smoothed: (1 + 20*0.01)/(1+20) = 1.2/21
    assert(got(1L)._4 == (1.0 + 20.0 * 0.01) / 21.0)
    assert(got(1L)._4 < 0.06, "one lucky conversion collapses")
    // u2 smoothed: (0 + 0.2)/119
    assert(got(2L)._4 == 0.2 / 119.0)
  }

  test("sprtLedger: monotone evidence crosses the H1 boundary; " +
      "hand-checked LLR arithmetic") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.DetLnImpl
    val c1 = DetLnImpl.eval(6L) - DetLnImpl.eval(5L)
    val c2 = DetLnImpl.eval(94L) - DetLnImpl.eval(95L)
    // day 1: 10 conv 10 fail; day 2: +20 conv → crosses ln 19
    val rows = (Seq.fill(10)((1L, true)) ++ Seq.fill(10)((1L, false))
      ++ Seq.fill(20)((2L, true))).toDF("day", "conv")
    val got = graft.ops.Eval.sprtLedger(rows, col("day"), col("conv"))
      .collect().sortBy(_.getLong(0))
    assert(got(0).getLong(1) == 10L && got(0).getLong(2) == 10L)
    assert(got(0).getDouble(3) == 10.0 * c1 + 10.0 * c2)
    assert(got(1).getLong(1) == 30L)
    assert(got(1).getDouble(3) == 30.0 * c1 + 10.0 * c2)
    assert(got(1).getDouble(3) > DetLnImpl.eval(19L))
    assert(got(0).getString(4) == "continue")
    assert(got(1).getString(4) == "accept_h1")
    // all failures walk to accept_h0
    val lo = (1L to 3L).flatMap(d =>
      Seq.fill(2000)((d, false))).toDF("day", "conv")
    val v = graft.ops.Eval.sprtLedger(lo, col("day"), col("conv"))
      .collect().sortBy(_.getLong(0)).last.getString(4)
    assert(v == "accept_h0")
  }

  test("ksTest: disjoint supports give D = 1; identical samples give " +
      "D = 0; hand-computed partial overlap") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val disj = Seq((true, 100L), (true, 200L), (false, 300L),
      (false, 400L)).toDF("a", "c")
    val r = graft.ops.Eval.ksTest(disj, col("a"), col("c")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 4L && r.getDouble(3) == 1.0)
    val same = Seq((true, 100L), (false, 100L), (true, 300L),
      (false, 300L)).toDF("a", "c")
    assert(graft.ops.Eval.ksTest(same, col("a"), col("c"))
      .head().getDouble(3) == 0.0)
    // A = {1,2}, B = {2,3} dollars: F diverges most at v=1:
    // |1*2 - 0*2| = 2 → D = 2/4 = 0.5
    val ovl = Seq((true, 100L), (true, 200L), (false, 200L),
      (false, 300L)).toDF("a", "c")
    val r2 = graft.ops.Eval.ksTest(ovl, col("a"), col("c")).head()
    assert(r2.getLong(2) == 2L && r2.getDouble(3) == 0.5)
  }

  test("psiDrift: identical balanced distributions give exactly 0; " +
      "a shifted distribution scores positive; Laplace keeps " +
      "one-sided bins finite") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val same = Seq((true, 0L), (false, 0L), (true, 900L),
      (false, 900L)).toDF("r", "c")
    assert(graft.ops.Eval.psiDrift(same, col("r"), col("c"))
      .head().getDouble(3) == 0.0)
    // reference mass low, current mass high — including a bin the
    // reference never saw (smoothing keeps it finite)
    val shift = (Seq.fill(50)((true, 0L)) ++ Seq.fill(50)((false, 900L)))
      .toDF("r", "c")
    val p = graft.ops.Eval.psiDrift(shift, col("r"), col("c")).head()
    assert(p.getLong(1) == 50L && p.getLong(2) == 50L)
    assert(p.getDouble(3) > 0.25, s"psi ${p.getDouble(3)}")
    assert(java.lang.Double.isFinite(p.getDouble(3)))
  }

  test("nelsonAalen: hand-worked hazard accumulation with censoring") {
    val s = spark
    import s.implicits._
    // t=1: n=4 d=1 → 1/4; t=2: n=3, one event one censor → +1/3;
    // t=3: n=1 d=1 → +1
    val rows = Seq((1L, true), (2L, true), (2L, false), (3L, true))
      .toDF("dur", "ev")
    val got = graft.ops.Eval.nelsonAalen(rows, "dur", "ev")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ==
      Seq((1L, 4L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)))
    assert(got(0)._4 == 0.25)
    assert(math.abs(got(1)._4 - (0.25 + 1.0 / 3.0)) < 1e-15)
    assert(math.abs(got(2)._4 - (0.25 + 1.0 / 3.0 + 1.0)) < 1e-15)
    // censoring-only times emit no row but shrink later risk sets
    val cens = Seq((1L, false), (2L, true)).toDF("dur", "ev")
    val g2 = graft.ops.Eval.nelsonAalen(cens, "dur", "ev").collect()
    assert(g2.length == 1 && g2(0).getLong(1) == 1L &&
      g2(0).getDouble(3) == 1.0)
  }

  test("logRank: identical arms give chi2 = 0 exactly; hand-computed " +
      "early-vs-late separation gives chi2 = 3") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // symmetric arms: every term cancels
    val sym = Seq((true, 1L, true), (false, 1L, true),
      (true, 2L, true), (false, 2L, true)).toDF("a", "dur", "ev")
    val r0 = graft.ops.Eval.logRank(sym, col("a"), "dur", "ev").head()
    assert(r0.getLong(0) == 2L && r0.getDouble(1) == 2.0)
    assert(r0.getDouble(3) == 0.0)
    // arm A events at t=1, arm B at t=3:
    // t=1: d=2 n=4 n1=2 → E += 1, V += 1·(2/4)·(2/3) = 1/3, O1 += 2
    // t=3: d=2 n=2 n1=0 → E += 0, V += 0
    // chi2 = (2 − 1)² / (1/3) = 3
    val sep = Seq((true, 1L, true), (true, 1L, true),
      (false, 3L, true), (false, 3L, true)).toDF("a", "dur", "ev")
    val r1 = graft.ops.Eval.logRank(sep, col("a"), "dur", "ev").head()
    assert(r1.getLong(0) == 2L)
    assert(math.abs(r1.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r1.getDouble(3) - 3.0) < 1e-9)
    // censored rows shape the risk sets but never the O/E events
    val cens = Seq((true, 1L, true), (false, 1L, false),
      (false, 2L, true)).toDF("a", "dur", "ev")
    val r2 = graft.ops.Eval.logRank(cens, col("a"), "dur", "ev").head()
    // t=1: d=1 n=3 n1=1 → E1 = 1/3, O1 = 1; t=2: d=1 n=1 n1=0 (n=1 →
    // no V term), E += 0
    assert(r2.getLong(0) == 1L)
    assert(math.abs(r2.getDouble(1) - 1.0 / 3.0) < 1e-12)
  }

  test("cuped: theta and adjusted lift on a hand-worked 4-user case; " +
      "balanced covariate leaves the raw lift untouched") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // (user, isPre, cents); arms by parity. Pre-period totals x:
    // u0=0 u2=200 (arm a), u1=400 u3=200 (arm b); in-period y:
    // u0=200 u2=400, u1=300 u3=500 → theta=0.25, dx_a=-100 dx_b=100,
    // adj_a=325 adj_b=375, lift=50 (raw lift 100, shrunk because arm
    // b entered richer)
    val rows = Seq(
      (0L, true, 0L), (2L, true, 200L), (1L, true, 400L),
      (3L, true, 200L), (0L, false, 200L), (2L, false, 400L),
      (1L, false, 300L), (3L, false, 500L)).toDF("u", "pre", "c")
    val r = graft.ops.Eval.cuped(rows, "u", col("u") % 2L, col("pre"),
      col("c")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3) - 0.25) < 1e-15)
    assert(math.abs(r.getDouble(6) - 325.0) < 1e-12)
    assert(math.abs(r.getDouble(7) - 375.0) < 1e-12)
    assert(math.abs(r.getDouble(8) - 50.0) < 1e-12)
    // balanced covariate (equal per-arm x sums): dx terms vanish, the
    // adjusted lift IS the raw mean difference
    val bal = Seq(
      (0L, true, 100L), (2L, true, 300L), (1L, true, 100L),
      (3L, true, 300L), (0L, false, 200L), (2L, false, 400L),
      (1L, false, 300L), (3L, false, 500L)).toDF("u", "pre", "c")
    val rb = graft.ops.Eval.cuped(bal, "u", col("u") % 2L, col("pre"),
      col("c")).head()
    assert(math.abs(rb.getDouble(8) - 100.0) < 1e-12)
    // constant covariate → var(X)=0 → guarded out, no row
    val const = Seq((0L, true, 5L), (1L, true, 5L), (0L, false, 1L),
      (1L, false, 2L)).toDF("u", "pre", "c")
    assert(graft.ops.Eval.cuped(const, "u", col("u") % 2L, col("pre"),
      col("c")).count() == 0)
  }

  test("diffInDiff: hand-worked two-arm case; identical arms give 0") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // arm a (even ids): pre means 150, post 225; arm b: 100 → 350
    // → did = 250 - 75 = 175
    val rows = Seq(
      (0L, true, 100L), (0L, false, 200L),
      (2L, true, 200L), (2L, false, 250L),
      (1L, true, 100L), (1L, false, 300L),
      (3L, true, 100L), (3L, false, 400L)).toDF("u", "pre", "c")
    val r = graft.ops.Eval.diffInDiff(rows, "u", col("u") % 2L,
      col("pre"), col("c")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 150.0 && r.getDouble(3) == 225.0)
    assert(r.getDouble(4) == 100.0 && r.getDouble(5) == 350.0)
    assert(r.getDouble(6) == 175.0)
    // arms with the same trajectory → did exactly 0
    val same = Seq((0L, true, 10L), (0L, false, 30L),
      (1L, true, 10L), (1L, false, 30L)).toDF("u", "pre", "c")
    assert(graft.ops.Eval.diffInDiff(same, "u", col("u") % 2L,
      col("pre"), col("c")).head().getDouble(6) == 0.0)
  }

  test("stratifiedLift: balanced strata reproduce the raw lift; " +
      "covariate imbalance is corrected stratum by stratum") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // balanced: every stratum has one user per arm → strat == raw
    val bal = Seq(
      (0L, true, 0L), (0L, false, 100L), (2L, true, 100L),
      (2L, false, 300L), (1L, true, 0L), (1L, false, 200L),
      (3L, true, 100L), (3L, false, 500L)).toDF("u", "pre", "c")
    val rb = graft.ops.Eval.stratifiedLift(bal, "u", col("u") % 2L,
      col("pre"), col("c")).head()
    assert(rb.getLong(0) == 2L && rb.getLong(1) == 4L)
    assert(rb.getDouble(2) == 150.0 && rb.getDouble(3) == 150.0)
    // imbalanced: arm b over-represented in the rich stratum; raw
    // lift 233.33 inflated, stratified recovers the within-stratum
    // truth 150
    val imb = Seq(
      (0L, true, 0L), (0L, false, 100L),
      (2L, true, 0L), (2L, false, 100L),
      (4L, true, 100L), (4L, false, 300L),
      (1L, true, 0L), (1L, false, 200L),
      (3L, true, 100L), (3L, false, 500L),
      (5L, true, 100L), (5L, false, 500L)).toDF("u", "pre", "c")
    val ri = graft.ops.Eval.stratifiedLift(imb, "u", col("u") % 2L,
      col("pre"), col("c")).head()
    assert(ri.getLong(0) == 2L && ri.getLong(1) == 6L)
    assert(math.abs(ri.getDouble(2) - 700.0 / 3.0) < 1e-12)
    assert(ri.getDouble(3) == 150.0)
  }

  test("markovBacktest: hand-worked transitions, argmax tie-break to " +
      "the smaller type, unseen prev dropped") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // train (tr=true), one user: a b a b  → a→b x2, b→a x1
    // eval: a b b and a lone unseen-prev z x
    val rows = Seq(
      (1L, "a", 1L, 10L, true), (1L, "b", 2L, 11L, true),
      (1L, "a", 3L, 12L, true), (1L, "b", 4L, 13L, true),
      (1L, "a", 10L, 20L, false), (1L, "b", 11L, 21L, false),
      (1L, "b", 12L, 22L, false),
      (2L, "z", 10L, 30L, false), (2L, "x", 11L, 31L, false))
      .toDF("u", "t", "ts", "id", "tr")
    val got = graft.ops.Eval.markovBacktest(rows, "u", "t", "ts",
        "id", col("tr"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("a", "b"), "unseen prev z dropped")
    assert(got("a") == (("b", 1L, 1L)))
    assert(got("b") == (("a", 1L, 0L)))
    // tie-break: c→a and c→b once each in train → predict "a"
    val tie = Seq((1L, "c", 1L, 1L, true), (1L, "b", 2L, 2L, true),
      (1L, "c", 3L, 3L, true), (1L, "a", 4L, 4L, true),
      (2L, "c", 1L, 5L, false), (2L, "a", 2L, 6L, false))
      .toDF("u", "t", "ts", "id", "tr")
    val gt = graft.ops.Eval.markovBacktest(tie, "u", "t", "ts",
      "id", col("tr")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gt("c") == "a")
  }

  test("isotonicCalibration: PAV pools the violating prefix; " +
      "already-monotone rates pass through; fit is monotone") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // scores land in 3 occupied deciles with raw rates .5, 0, 1:
    // PAV pools the first two -> .25, .25, 1
    def mk(score: Long, pos: Int, neg: Int) =
      Seq.fill(pos)((score, true)) ++ Seq.fill(neg)((score, false))
    val rows = (mk(0L, 1, 1) ++ mk(5L, 0, 2) ++ mk(9L, 2, 0))
      .toDF("sc", "y")
    val got = graft.ops.Eval.isotonicCalibration(rows, "sc",
        col("y"), nBins = 10)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq(0.5, 0.0, 1.0))
    assert(got.map(_._2).toSeq == Seq(0.25, 0.25, 1.0))
    // monotone input is a fixed point
    val mono = (mk(0L, 0, 2) ++ mk(5L, 1, 1) ++ mk(9L, 2, 0))
      .toDF("sc", "y")
    val g2 = graft.ops.Eval.isotonicCalibration(mono, "sc",
        col("y"), nBins = 10)
      .collect().sortBy(_.getLong(0)).map(_.getDouble(4)).toSeq
    assert(g2 == Seq(0.0, 0.5, 1.0))
    assert(g2 == g2.sorted)
  }

  test("ucbPolicy: exact means, bonus follows sqrt(2 ln N / n)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(("a", 100L), ("a", 300L), ("b", 200L))
      .toDF("arm", "c")
    val out = graft.ops.Eval.ucbPolicy(rows, "arm", col("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ra = out("a"); val rb = out("b")
    assert(ra.getLong(1) == 2L && ra.getLong(2) == 3L)
    assert(ra.getDouble(3) == 200.0 && rb.getDouble(3) == 200.0)
    // DetLn is within 2e-11 of the true ln
    assert(math.abs(ra.getDouble(4) - math.sqrt(math.log(3.0))) < 1e-9)
    assert(math.abs(rb.getDouble(4) - math.sqrt(2.0 * math.log(3.0)))
      < 1e-9)
    // fewer pulls → strictly larger bonus → larger ucb at equal mean
    assert(rb.getDouble(5) > ra.getDouble(5))
  }
}
