package graft.ops

import graft.SparkSuite

/** frontier2d must equal the brute-force dominance filter for any
  * input, with the grid prune invisible in the result — including
  * degenerate bucket layouts (1 bucket, more buckets than points).
  */
class SkylineSpec extends SparkSuite {

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet
  }

  private def run(pts: Seq[(Long, Long)], buckets: Int = 1024)
      : Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    Skyline.frontier2d(pts.toDF("x", "y"), "x", "y", buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("known frontier: staircase with dominated interior") {
    val pts = Seq[(Long, Long)](
      (1, 9), (2, 9), (3, 7), (5, 5), (7, 3), (9, 1),
      (2, 2), (4, 4), (6, 2), (3, 9) // interior + a tie riser
    )
    // (3,9) dominates (1,9),(2,9); frontier is the outer staircase
    val got = run(pts)
    assert(got == brute(pts))
    assert(got == Set((3L, 9L), (5L, 5L), (7L, 3L), (9L, 1L)))
  }

  test("duplicates collapse, same-x keeps only max y") {
    val pts = Seq[(Long, Long)]((5, 5), (5, 5), (5, 3), (5, 9), (1, 1))
    assert(run(pts) == Set((5L, 9L)))
  }

  test("single point, and all-identical points") {
    assert(run(Seq((7L, 7L))) == Set((7L, 7L)))
    assert(run(Seq.fill(10)((4L, 2L))) == Set((4L, 2L)))
  }

  test("empty input is empty") {
    assert(run(Seq.empty[(Long, Long)]) == Set.empty)
  }

  test("property: equals brute force across bucket layouts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5; buckets <- Seq(1, 7, 4096)) {
      val n = 50 + trial * 37
      val pts = Seq.fill(n)(
        (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      assert(run(pts, buckets) == brute(pts),
        s"trial=$trial buckets=$buckets")
    }
  }

  test("anti-correlated worst case (everything on the frontier)") {
    val pts = (0L to 99L).map(i => (i, 99L - i))
    assert(run(pts, buckets = 16) == pts.toSet)
  }

  test("merge identity: skyline(skyline(A) ∪ B) == skyline(A ∪ B)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val a = Seq.fill(150)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
    val b = Seq.fill(40)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
    val fa = Skyline.frontier2d(a.toDF("x", "y"), "x", "y")
    val incr = Skyline.frontier2d(
        fa.unionByName(b.toDF("x", "y")), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == brute(a ++ b))
  }
}
