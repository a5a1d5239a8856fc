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
}
