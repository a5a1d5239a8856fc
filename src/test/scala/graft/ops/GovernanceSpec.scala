package graft.ops

import graft.SparkSuite

/** Data-governance audits: k-anonymity class census and FK
  * containment profiling, hand-checked.
  */
class GovernanceSpec extends SparkSuite {

  test("kAnonymity: class-size histogram and risky flag") {
    val s = spark
    import s.implicits._
    // classes over (a, b): (x,1)x3, (x,2)x1, (y,1)x1 → sizes 3,1,1
    val df = Seq(("x", 1, 10), ("x", 1, 20), ("x", 1, 30), ("x", 2, 40),
      ("y", 1, 50)).toDF("a", "b", "v")
    val out = Relational.kAnonymity(df, Seq("a", "b"), k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(3L -> ((1L, 3L, false)), 1L -> ((2L, 2L, true))))
  }

  test("lDiversity: distinct-sensitive census catches the " +
    "homogeneous class kAnonymity misses") {
    val s = spark
    import s.implicits._
    // class (x,1): 3 rows but ONE sensitive value (l=1, k-anonymous
    // yet leaking); class (y,1): 2 rows, 2 values (l=2); class
    // (z,2): 1 row (l=1)
    val df = Seq(("x", 1, "flu"), ("x", 1, "flu"), ("x", 1, "flu"),
      ("y", 1, "flu"), ("y", 1, "cold"), ("z", 2, "flu"))
      .toDF("a", "b", "diag")
    val out = Relational.lDiversity(df, Seq("a", "b"), "diag", l = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(1L -> ((2L, 4L, true)), 2L -> ((1L, 2L, false))))
  }

  test("tCloseness: hand-computed total variation; the skewed class " +
      "is risky, the representative one is not") {
    val s = spark
    import s.implicits._
    // global: a 6x, b 6x over 12 rows (p = 1/2 each).
    // class q=1: 4a 2b (TV = 1/2*(|4/6-1/2| + |2/6-1/2|) = 1/6)
    // class q=2: 2a 4b (TV = 1/6)
    // class q=3: 0a... wait rows must sum: q=3 holds 0 — use 3 classes:
    // q=1: 4a 2b; q=2: 2a 4b — total 6a 6b.
    val df = (Seq.fill(4)((1L, "a")) ++ Seq.fill(2)((1L, "b")) ++
      Seq.fill(2)((2L, "a")) ++ Seq.fill(4)((2L, "b")))
      .toDF("q", "sv")
    val out = Relational.tCloseness(df, Seq("q"), "sv", t = 0.1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // num(q=1) = |4*12 - 6*6| + |2*12 - 6*6| = 12 + 12 = 24;
    // tv = 24 / (2*6*12) = 1/6
    assert(out(1L) == ((6L, 24.0 / 144.0, true)))
    assert(out(2L) == ((6L, 24.0 / 144.0, true)))
    // a perfectly representative class is tv = 0, not risky
    val rep = (Seq.fill(3)((1L, "a")) ++ Seq.fill(3)((1L, "b")) ++
      Seq.fill(1)((2L, "a")) ++ Seq.fill(1)((2L, "b")))
      .toDF("q", "sv")
    val out2 = Relational.tCloseness(rep, Seq("q"), "sv", t = 0.1)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out2(1L) == ((0.0, false)) && out2(2L) == ((0.0, false)))
  }

  test("fkProfile: containment, matched keys, orphan rows") {
    val s = spark
    import s.implicits._
    // child rows: keys 1,1,2,3 — parent has 1,2 → key 3 orphan (1 row,
    // but 2 child rows carry key 1)
    val child = Seq(1L, 1L, 2L, 3L).toDF("k")
    val parent = Seq(1L, 2L, 9L).toDF("pk0")
    val r = Relational.fkProfile(child, "k", parent, "pk0", "c->p")
      .collect().head
    assert(r.getString(0) == "c->p")
    assert(r.getAs[Long]("n_child_keys") == 3L)
    assert(r.getAs[Long]("n_matched_keys") == 2L)
    assert(r.getAs[Double]("containment") == 2.0 / 3.0)
    assert(r.getAs[Long]("n_orphan_rows") == 1L)
  }

  test("winsorizeStats: exact integer-rank order statistics and clip " +
    "counts") {
    val s = spark
    import s.implicits._
    // 200 values 0.01..2.00 → cents 1..200. ceil(n/100)=2 → p01=2;
    // ceil(99n/100)=198 → p99=198; clip_lo = |{1}| = 1,
    // clip_hi = |{199,200}| = 2
    val df = (1 to 200).map(i => ("t", i.toLong, i / 100.0))
      .toDF("g", "event_id", "value")
    val r = Relational.winsorizeStats(df, "g", "event_id")
      .collect().head
    assert(r.getAs[Long]("n") == 200L)
    assert(r.getAs[Long]("p01_cents") == 2L)
    assert(r.getAs[Long]("p99_cents") == 198L)
    assert(r.getAs[Long]("n_clip_lo") == 1L)
    assert(r.getAs[Long]("n_clip_hi") == 2L)
  }

  test("winsorizeStats: tiny groups degrade to min/max, nothing clips") {
    val s = spark
    import s.implicits._
    // n=3: ranks ceil(3/100)=1 → p01=min; ceil(297/100)=3 → p99=max
    val df = Seq(("g", 1L, 0.50), ("g", 2L, 0.10), ("g", 3L, 0.90))
      .toDF("g", "event_id", "value")
    val r = Relational.winsorizeStats(df, "g", "event_id")
      .collect().head
    assert(r.getAs[Long]("p01_cents") == 10L)
    assert(r.getAs[Long]("p99_cents") == 90L)
    assert(r.getAs[Long]("n_clip_lo") == 0L)
    assert(r.getAs[Long]("n_clip_hi") == 0L)
  }

  test("fkProfile: duplicate parent keys do not fan out child rows") {
    val s = spark
    import s.implicits._
    val child = Seq(1L, 2L).toDF("k")
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pk0")
    val r = Relational.fkProfile(child, "k", parent, "pk0", "x")
      .collect().head
    assert(r.getAs[Long]("n_child_keys") == 2L)
    assert(r.getAs[Long]("n_matched_keys") == 2L)
    assert(r.getAs[Double]("containment") == 1.0)
    assert(r.getAs[Long]("n_orphan_rows") == 0L)
  }

  test("dpCounts: noise equals the scala replay of the hash-seeded " +
      "geometric draws; reproducible; true histogram never released") {
    val s = spark
    import s.implicits._
    def polyHash(str: String): Long =
      str.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    def trailingOnes(b: Long): Long = {
      var k = 0L
      var x = b
      while (k < 16 && (x & 1L) == 1L) { k += 1; x >>= 1 }
      k
    }
    def noise(key: String): Long = {
      val u = (polyHash(key) * 2654435761L) % 4294967296L
      trailingOnes(u % 65536L) - trailingOnes(u >> 16)
    }
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 1L), ("b", 1L)).toDF("t", "day")
    val got = Relational.dpCounts(rows, Seq("t", "day"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", 1L) -> (3L + noise("a:1")),
      ("a", 2L) -> (1L + noise("a:2")),
      ("b", 1L) -> (2L + noise("b:1"))))
    // output schema carries ONLY the noisy count
    assert(Relational.dpCounts(rows, Seq("t", "day")).columns.toSeq
      == Seq("t", "day", "dp_count"))
    // reproducible: a second run releases identical values
    val again = Relational.dpCounts(rows, Seq("t", "day"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == got)
    // the two geometric fields are genuinely spread: across many
    // cells, noise must take both signs (not a constant-zero stub)
    val many = (0 until 400).map(i => (s"k$i", i.toLong))
      .toDF("t", "day")
    val ns = Relational.dpCounts(many, Seq("t", "day"))
      .collect().map(_.getLong(2) - 1L)
    assert(ns.exists(_ > 0) && ns.exists(_ < 0) && ns.exists(_ == 0))
    assert(ns.forall(n => n >= -16 && n <= 16))
  }

  test("olsFit: recovers an exact plane bit-for-bit; matches a BigInt " +
      "Cramer replay on noisy data; rank-deficient design emits nothing") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // y = 2 + 3*x1 + 5*x2 exactly
    val plane = Seq((0L, 0L, 2L), (1L, 0L, 5L), (0L, 1L, 7L),
      (1L, 1L, 10L), (2L, 1L, 13L)).toDF("x1", "x2", "y")
    val r = graft.ops.Eval.olsFit(plane, col("y"), col("x1"),
      col("x2")).head()
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 3.0 &&
      r.getDouble(3) == 5.0)
    // noisy data: replay Cramer in BigInt
    val pts = Seq((1L, 2L, 7L), (2L, 1L, 9L), (3L, 5L, 30L),
      (4L, 2L, 18L), (5L, 8L, 55L), (6L, 1L, 21L))
    def fit(p: Seq[(Long, Long, Long)]): (Double, Double, Double) = {
      val n = BigInt(p.size)
      val s1 = BigInt(p.map(_._1).sum); val s2 = BigInt(p.map(_._2).sum)
      val sy = BigInt(p.map(_._3).sum)
      val s11 = BigInt(p.map(q => q._1 * q._1).sum)
      val s12 = BigInt(p.map(q => q._1 * q._2).sum)
      val s22 = BigInt(p.map(q => q._2 * q._2).sum)
      val s1y = BigInt(p.map(q => q._1 * q._3).sum)
      val s2y = BigInt(p.map(q => q._2 * q._3).sum)
      val det = n * (s11 * s22 - s12 * s12) -
        s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
      val d0 = sy * (s11 * s22 - s12 * s12) -
        s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
      val d1 = n * (s1y * s22 - s12 * s2y) -
        sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
      val d2 = n * (s11 * s2y - s1y * s12) -
        s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
      (d0.toDouble / det.toDouble, d1.toDouble / det.toDouble,
        d2.toDouble / det.toDouble)
    }
    val want = fit(pts)
    val got = graft.ops.Eval.olsFit(pts.toDF("x1", "x2", "y"),
      col("y"), col("x1"), col("x2")).head()
    assert(got.getDouble(1) == want._1 && got.getDouble(2) == want._2
      && got.getDouble(3) == want._3)
    // collinear x2 = 2*x1 → det 0 → no row
    val bad = Seq((1L, 2L, 3L), (2L, 4L, 5L), (3L, 6L, 8L))
      .toDF("x1", "x2", "y")
    assert(graft.ops.Eval.olsFit(bad, col("y"), col("x1"),
      col("x2")).count() == 0)
  }
}
