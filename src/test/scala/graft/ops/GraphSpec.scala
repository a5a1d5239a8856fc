package graft.ops

import graft.SparkSuite

/** Integer-PageRank semantics the `link_rank` oracle row can't
  * isolate: the damping fold on a hand-computed graph, sink/source
  * handling, multi-edge weighting, and layout-independence of the
  * integer arithmetic.
  */
class GraphSpec extends SparkSuite {

  private def ranks(edges: Seq[(Long, Long)], nodeIds: Seq[Long],
                    iters: Int, base: Long,
                    parts: Int = 1): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val nodes = nodeIds.toDF("id").repartition(parts)
    val e = edges.toDF("src", "dst").repartition(parts)
    Graph.pageRank(nodes, "id", e, iters, base)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("one step matches the hand-computed damping fold") {
    // 0 -> {1, 2}, 1 -> 2, 2 -> 0; base 100:
    //   r(0) = 15 + (100 div 1)*85 div 100 = 100
    //   r(1) = 15 + (100 div 2)*85 div 100 = 57
    //   r(2) = 15 + (50 + 100)*85 div 100  = 142
    val got = ranks(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)),
      Seq(0L, 1L, 2L), iters = 1, base = 100L)
    assert(got == Map(0L -> 100L, 1L -> 57L, 2L -> 142L))
  }

  test("a no-in-edge source keeps only the teleport share; a sink " +
    "still receives") {
    // 0 -> 1 and nothing else; node 2 isolated
    val got = ranks(Seq((0L, 1L)), Seq(0L, 1L, 2L), iters = 1,
      base = 1000L)
    assert(got(0L) == 150L, "source: teleport only")
    assert(got(1L) == 150L + 1000L * 85L / 100L)
    assert(got(2L) == 150L, "isolated node = teleport only")
  }

  test("parallel edges contribute per edge and count in out-degree") {
    // 0 -> 1 twice, 0 -> 2 once: odeg(0)=3, node 1 gets 2 shares
    val got = ranks(Seq((0L, 1L), (0L, 1L), (0L, 2L)), Seq(0L, 1L, 2L),
      iters = 1, base = 300L)
    assert(got(1L) == 45L + (100L + 100L) * 85L / 100L)
    assert(got(2L) == 45L + 100L * 85L / 100L)
  }

  test("integer ranks are identical across partition layouts and " +
    "total mass never grows") {
    val n = 60
    val edges = (0L until n).flatMap(i =>
      Seq((i, (i * 7 + 1) % n), (i, (i * 13 + 5) % n)))
      .filter { case (a, b) => a != b }
    val ids = (0L until n)
    val a = ranks(edges, ids, iters = 3, base = 1000000L, parts = 1)
    val b = ranks(edges, ids, iters = 3, base = 1000000L, parts = 7)
    assert(a == b, "partition-layout independence")
    assert(a.values.sum <= n * 1000000L, "damping + truncation never " +
      "create mass")
  }
}
