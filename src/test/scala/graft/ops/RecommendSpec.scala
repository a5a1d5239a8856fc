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
}
