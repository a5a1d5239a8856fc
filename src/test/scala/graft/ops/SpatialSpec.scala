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

  // --- DBSCAN ------------------------------------------------------

  /** Reference DBSCAN with the operator's deterministic label rules
    * (cluster = min core id of the component, border = min core
    * neighbor's label), run to full convergence.
    */
  private def refDbscan(pts: Seq[(Long, Long, Long)], eps: Long,
                        minPts: Int): Set[(Long, String, Long)] = {
    val e2 = eps * eps
    def nbrs(p: (Long, Long, Long)) = pts.filter(q =>
      (p._2 - q._2) * (p._2 - q._2) + (p._3 - q._3) * (p._3 - q._3) <= e2)
    val core = pts.filter(p => nbrs(p).size >= minPts).map(_._1).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.map(i => i -> i).toSeq: _*)
    def find(i: Long): Long =
      if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    for (p <- pts if core(p._1); q <- nbrs(p) if core(q._1)) {
      val (a, b) = (find(p._1), find(q._1))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val label = core.map(i => i -> find(i)).toMap
    val out = scala.collection.mutable.Set[(Long, String, Long)]()
    for (p <- pts) {
      if (core(p._1)) out += ((p._1, "core", label(p._1)))
      else {
        val cn = nbrs(p).filter(q => q._1 != p._1 && core(q._1))
        if (cn.nonEmpty) out += ((p._1, "border", cn.map(q => label(q._1)).min))
        else out += ((p._1, "noise", -1L))
      }
    }
    out.toSet
  }

  private def runDbscan(pts: Seq[(Long, Long, Long)], eps: Long,
                        minPts: Int): Set[(Long, String, Long)] = {
    val s = spark
    import s.implicits._
    Spatial.dbscan(pts.toDF("id", "x", "y"), "id", "x", "y", eps,
        minPts, iters = 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
  }

  test("dbscan: two blobs, a bridge border, and noise") {
    val pts = Seq[(Long, Long, Long)](
      // blob A (tight): ids 1-4 all within eps of each other
      (1, 0, 0), (2, 3, 0), (3, 0, 3), (4, 3, 3),
      // blob B: ids 10-13
      (10, 100, 100), (11, 103, 100), (12, 100, 103), (13, 103, 103),
      // border: near blob A's edge but with too few neighbors to be core
      (20, 9, 0),
      // noise
      (30, 50, 50)
    )
    val got = runDbscan(pts, eps = 7, minPts = 4)
    assert(got == refDbscan(pts, 7, 4))
    assert(got.contains((1L, "core", 1L)))
    assert(got.contains((10L, "core", 10L)))
    assert(got.contains((20L, "border", 1L)))
    assert(got.contains((30L, "noise", -1L)))
  }

  test("dbscan property: equals reference on random clustered points") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val pts = (1L to 90L).map { i =>
        val cx = (i % 3) * 120 - 120 // three cluster centers, signed
        (i, cx + rnd.nextInt(40).toLong, (rnd.nextInt(40) - 20).toLong)
      }
      for ((eps, minPts) <- Seq((12L, 4), (25L, 6)))
        assert(runDbscan(pts, eps, minPts) == refDbscan(pts, eps, minPts),
          s"trial=$trial eps=$eps minPts=$minPts")
    }
  }
}
