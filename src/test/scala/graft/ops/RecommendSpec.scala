package graft.ops

import graft.SparkSuite

class RecommendSpec extends SparkSuite {

  test("copurchaseTopK: lift ranking with deterministic ties") {
    val s = spark
    import s.implicits._
    // baskets: c1={1,2}, c2={1,2}, c3={1,3} (+ a duplicate row)
    val eng = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (3L, 3L), (3L, 3L)).toDF("cust", "item")
    val out = Recommend.copurchaseTopK(eng, k = 5).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        ((r.getAs[Long]("n_co"), r.getAs[Double]("lift"),
          r.getAs[Long]("rk")))).toMap
    // counts: c(1)=3, c(2)=2, c(3)=1, N=3
    // lift(1,2) = 2*3/(3*2) = 1.0 ; lift(1,3) = 1*3/(3*1) = 1.0
    assert(out((1L, 2L)) == ((2L, 1.0, 1L)), "tie broken by item_b asc")
    assert(out((1L, 3L)) == ((1L, 1.0, 2L)))
    assert(out((2L, 1L)) == ((2L, 1.0, 1L)))
    assert(out((3L, 1L)) == ((1L, 1.0, 1L)))
    assert(out.size == 4)
  }

  test("copurchaseTopK: basket cap bounds the pair unfold " +
    "deterministically (smallest item ids kept)") {
    val s = spark
    import s.implicits._
    val eng = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L))
      .toDF("cust", "item")
    val out = Recommend.copurchaseTopK(eng, k = 5, basketCap = 2)
      .collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")))
      .toSet
    // c1's basket capped to {10, 20} — item 30 never pairs
    assert(out == Set((10L, 20L), (20L, 10L)))
  }

  test("ndcgPopularity: hand-worked DCG/IDCG; misses score 0; a " +
      "perfect prefix scores 1") {
    val s = spark
    import s.implicits._
    import graft.functions.DetLnImpl
    val d1 = DetLnImpl.eval(2L) / DetLnImpl.eval(2L) // = 1.0
    val d2 = DetLnImpl.eval(2L) / DetLnImpl.eval(3L)
    val d3 = DetLnImpl.eval(2L) / DetLnImpl.eval(4L)
    // popularity 1 > 2 > 3 by count
    val train = Seq.fill(3)((100L, 1L)) ++ Seq.fill(2)((100L, 2L)) ++
      Seq((100L, 3L))
    // A hits ranks 1+3 of m=2; B misses; C hits rank 2 of m=1;
    // D is the perfect prefix {1, 2} → ndcg exactly 1
    val ev = Seq((1L, 1L), (1L, 3L), (2L, 5L), (3L, 2L),
      (4L, 1L), (4L, 2L))
    val got = graft.ops.Recommend.ndcgPopularity(
        train.toDF("cust", "item"), ev.toDF("cust", "item"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toMap
    assert(got(1L)._1 == 2L)
    assert(got(1L)._2 == d1 + d3)
    assert(got(1L)._3 == d1 + d2)
    assert(got(1L)._4 == (d1 + d3) / (d1 + d2))
    assert(got(2L) == ((1L, 0.0, d1, 0.0)))
    assert(got(3L)._2 == d2 && got(3L)._4 == d2)
    assert(got(4L)._4 == 1.0)
  }
}
