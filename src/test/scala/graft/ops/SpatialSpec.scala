package graft.ops

import graft.SparkSuite

/** radiusJoin must equal the brute-force quadratic filter — including
  * negative coordinates (floor-division bucketing), pairs straddling
  * cell boundaries, and the exact boundary dist² == r².
  */
class SpatialSpec extends SparkSuite {

  private def brute(pts: Seq[(Long, Long, Long)], r: Long)
      : Set[(Long, Long, Long)] = {
    val r2 = r * r
    (for {
      (ia, xa, ya) <- pts
      (ib, xb, yb) <- pts
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r2
    } yield (ia, ib, d2)).toSet
  }

  private def run(pts: Seq[(Long, Long, Long)], r: Long)
      : Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val df = pts.toDF("id", "x", "y")
    Spatial.radiusJoin(df, df, "id", "x", "y", r)
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2)))
      .toSet
  }

  test("known pairs: boundary inclusive, cross-cell, negatives") {
    val pts = Seq[(Long, Long, Long)](
      (1, 0, 0), (2, 10, 0),    // dist² = 100 == r² at r=10 → pair
      (3, -1, -1), (4, -11, -1),// negative coords, boundary again
      (5, 100, 100),            // isolated
      (6, 19, 0)                // near point 2 (dist² 81) not point 1
    )
    val got = run(pts, 10)
    assert(got == brute(pts, 10))
    assert(got.contains((1L, 2L, 100L)))
    assert(got.contains((3L, 4L, 100L)))
    assert(got.contains((2L, 6L, 81L)))
    assert(!got.exists(p => p._1 == 5L && p._2 != 5L))
  }

  test("property: equals brute force on random clustered points") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val pts = (1L to 120L).map { i =>
        // clustered: half the points near the origin, half spread out,
        // both signs
        val spread = if (i % 2 == 0) 30 else 300
        (i, (rnd.nextInt(2 * spread) - spread).toLong,
          (rnd.nextInt(2 * spread) - spread).toLong)
      }
      for (r <- Seq(5L, 17L, 64L))
        assert(run(pts, r) == brute(pts, r), s"trial=$trial r=$r")
    }
  }

  test("empty and singleton inputs") {
    assert(run(Seq.empty, 10) == Set.empty)
    assert(run(Seq((1L, 5L, 5L)), 10) == Set((1L, 1L, 0L)))
  }
}
