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

  test("bfsDistance: shortest hop counts, hop cap, unreached = -1") {
    val s = spark
    import s.implicits._
    // 0→1→2→3→4 chain plus shortcut 0→3; node 9 isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L))
      .toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 9L).toDF("id")
    val got = Graph.bfsDistance(nodes, "id", edges,
        org.apache.spark.sql.functions.col("id") === 0L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 reached in ONE hop via the shortcut, so 4 is at 2, not 4
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L,
      4L -> 2L, 9L -> -1L))
    // hop cap: with maxHops=1 only the direct neighbors settle
    val capped = Graph.bfsDistance(nodes, "id", edges,
        org.apache.spark.sql.functions.col("id") === 0L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> -1L,
      4L -> -1L, 9L -> -1L))
  }

  private def triCensus(edges: Seq[(Long, Long)], nodeIds: Seq[Long],
                        parts: Int = 1): Map[Long, (Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    Graph.triangles(nodeIds.toDF("id").repartition(parts), "id",
        edges.toDF("src", "dst").repartition(parts))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
  }

  test("triangles: hand-checked K4-minus-an-edge + isolated node") {
    // 0-1, 0-2, 0-3, 1-2, 1-3 (K4 without 2-3); node 9 isolated.
    // Triangles: {0,1,2}, {0,1,3}. Direction/duplicates/self-loops in
    // the input must not matter.
    val edges = Seq((0L, 1L), (2L, 0L), (0L, 3L), (1L, 2L), (3L, 1L),
      (1L, 0L), (2L, 2L))
    val got = triCensus(edges, Seq(0L, 1L, 2L, 3L, 9L))
    assert(got(0L) == ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(got(1L) == ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((2L, 1L, 1.0)))
    assert(got(9L) == ((0L, 0L, 0.0)))
  }

  test("triangles match the brute-force census on a random graph, " +
    "layout-independent") {
    val rnd = new scala.util.Random(23)
    val n = 40
    val edges = Seq.fill(220)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val ids = (0L until n).toSeq
    // brute-force model
    val adj = edges.collect { case (a, b) if a != b =>
      Set(a, b)
    }.distinct
    def linked(a: Long, b: Long) = adj.contains(Set(a, b))
    val want = ids.map { v =>
      val nbrs = ids.filter(u => u != v && linked(u, v))
      val tri = (for {
        i <- nbrs.indices; j <- i + 1 until nbrs.size
        if linked(nbrs(i), nbrs(j))
      } yield 1).size.toLong
      val d = nbrs.size.toLong
      val lcc = if (d >= 2) 2.0 * tri / (d * (d - 1)) else 0.0
      v -> ((d, tri, lcc))
    }.toMap
    assert(triCensus(edges, ids, parts = 1) == want)
    assert(triCensus(edges, ids, parts = 7) == want)
    assert(want.values.map(_._2).sum > 0, "fixture has triangles")
  }

  /** Reference bounded-round peel on the deduped undirected edges. */
  private def refKCore(nodes: Seq[Long], edges: Seq[(Long, Long)],
                       k: Int, iters: Int): Set[(Long, Long, Boolean)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val deg0 = und.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    var alive = nodes.toSet
    for (_ <- 1 to iters) {
      val e = und.filter(p => alive(p._1) && alive(p._2))
      val deg = e.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      alive = alive.filter(n => deg.getOrElse(n, 0) >= k)
    }
    nodes.map(n => (n, deg0.getOrElse(n, 0L), alive(n))).toSet
  }

  test("kCore: cascade peel on a chain-into-clique, matches reference") {
    val s = spark
    import s.implicits._
    // K4 clique (1-4) + a tail 5-6-7 that must cascade off at k=2;
    // a parallel/reversed edge and a self loop to test the dedupe
    val ids = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (2L, 1L), (7L, 7L))
      .toDF("src", "dst")
    val got = Graph.kCore(ids, "id", edges, k = 2, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(got == refKCore(1L to 7L, Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (2L, 1L), (7L, 7L)), 2, 4))
    // the K4 survives; the tail cascades off round by round
    assert(got.filter(_._3).map(_._1) == Set(1L, 2L, 3L, 4L))
    assert(got.contains((7L, 1L, false))) // self loop didn't count
  }

  /** Reference synchronous LPA: most-frequent neighbor label, ties to
    * the smallest label, isolated nodes keep their own. */
  private def refLpa(nodes: Seq[Long], edges: Seq[(Long, Long)],
                     iters: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val next = sym.groupBy(_._1).map { case (n, es) =>
        val counts = es.map(e => lbl(e._2))
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
      lbl = lbl.map { case (n, old) => n -> next.getOrElse(n, old) }
    }
    lbl
  }

  test("labelPropagation: two cliques joined by one bridge settle " +
      "into two communities; equals the reference fold") {
    val s = spark
    import s.implicits._
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val edges = (cliqueA ++ cliqueB :+ (4L, 10L)) :+ (20L, 21L)
    val nodes = ((1L to 4L) ++ (10L to 13L) ++ Seq(20L, 21L, 30L))
    val got = Graph.labelPropagation(nodes.toDF("id"), "id",
        edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refLpa(nodes, edges, 4))
    // clique A coalesces on its min label; clique B stays its own
    // community rather than flooding to A's (what min-label CC would do)
    assert((1L to 4L).map(got).toSet.size == 1)
    assert((10L to 13L).map(got).toSet.size == 1)
    assert(got(1L) != got(11L), "LPA must NOT merge across the bridge")
    assert(got(30L) == 30L, "isolated node keeps its own label")
  }

  test("labelPropagation equals reference on a random graph") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val nodes = 1L to 50L
    val edges = Seq.fill(120)(
      (rnd.nextInt(50).toLong + 1, rnd.nextInt(50).toLong + 1))
    val got = Graph.labelPropagation(nodes.toDF("id"), "id",
        edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refLpa(nodes, edges, 3))
  }

  test("kCore equals reference on a random graph across k") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val nodes = 1L to 60L
    val edges = Seq.fill(150)(
      (rnd.nextInt(60).toLong + 1, rnd.nextInt(60).toLong + 1))
    for (k <- Seq(2, 4, 6)) {
      val got = Graph.kCore(nodes.toDF("id"), "id",
          edges.toDF("src", "dst"), k = k, iters = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(got == refKCore(nodes, edges, k, 5), s"k=$k")
    }
  }

  test("hits: hand-traced max-normalized rounds on a two-hub star; " +
      "pure sinks/sources score zero on the opposite side") {
    val s = spark
    import s.implicits._
    // 1 -> {2,3}, 4 -> 2: node 1 is the better hub, 2 the better
    // authority. Hand trace at base 100, 3 rounds (integer DIV):
    //   hubs -> 1:100 4:62, auths -> 2:100 3:61
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L)).toDF("src", "dst")
    val got = Graph.hits(nodes, "id", edges, iters = 3, base = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) == ((100L, 0L)))
    assert(got(4L) == ((62L, 0L)))
    assert(got(2L) == ((0L, 100L)))
    assert(got(3L) == ((0L, 61L)))
    // layout-independence of the integer fixed point
    val a = Graph.hits(nodes.repartition(1), "id",
      edges.repartition(1), iters = 3, base = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val b = Graph.hits(nodes.repartition(5), "id",
      edges.repartition(3), iters = 3, base = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(a == b)
  }

  test("personalizedPageRank: teleport mass flows only to seeds; " +
      "hand-computed one-step ring; isolated nodes") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // ring 0→1→2→0, seed {0}, base 100, one step:
    //   r(0) = 15 + 0, r(1) = 0 + 100*85/100 = 85, r(2) = 0
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val got = Graph.personalizedPageRank(nodes, "id", edges,
        col("id") === 0L, iters = 1, base = 100L)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1),
        r.getLong(2))).toMap
    assert(got(0L) == ((true, 15L)))
    assert(got(1L) == ((false, 85L)))
    assert(got(2L) == ((false, 0L)))
    assert(got(3L) == ((false, 0L)), "isolated non-seed stays 0")
    // two steps: authority reaches node 2 via 1
    val g2 = Graph.personalizedPageRank(nodes, "id", edges,
        col("id") === 0L, iters = 2, base = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g2(2L) == 85L * 85L / 100L)
    // no seeds → all zero teleport, everything decays to 0
    val g0 = Graph.personalizedPageRank(nodes, "id", edges,
        col("id") < 0L, iters = 3, base = 100L)
      .collect().map(_.getLong(2)).toSet
    assert(g0 == Set(0L))
  }

  test("linkPredict: hand-worked path and square; adjacent pairs " +
      "excluded; matches a brute-force reference on a random graph") {
    val s = spark
    import s.implicits._
    // path 1-2-3: only non-edge with a witness is (1,3) through 2
    // (deg 2) → aa = 1/ln 2, ra = 1/2
    val path = Graph.linkPredict(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")).collect()
    assert(path.length == 1)
    assert(path(0).getLong(0) == 1L && path(0).getLong(1) == 3L)
    assert(path(0).getLong(2) == 1L)
    // the DetLn series sits within 2e-11 of the true ln
    assert(math.abs(path(0).getDouble(3) - 1.0 / math.log(2.0)) < 1e-9)
    assert(path(0).getDouble(3) ==
      1.0 / graft.functions.DetLnImpl.eval(2L))
    assert(path(0).getDouble(4) == 0.5)
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) each see two deg-2
    // witnesses → aa = 2/ln 2, ra = 1.0; the four edges never appear
    val sq = Graph.linkPredict(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sq == Set((1L, 3L), (2L, 4L)))
    // brute-force reference on a deterministic random graph
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(20).toLong,
      rnd.nextInt(20).toLong)).filter(e => e._1 != e._2).distinct
    val uniq = edges.map(e => (math.min(e._1, e._2),
      math.max(e._1, e._2))).toSet
    val nbr = uniq.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = (for {
      u <- nbr.keys; v <- nbr.keys
      if u < v && !uniq.contains((u, v))
      common = nbr(u) & nbr(v) if common.nonEmpty
    } yield {
      val ds = common.toSeq.map(w => (nbr(w).size, w)).sorted
      ((u, v), (common.size.toLong,
        ds.foldLeft(0.0)((a, x) =>
          a + 1.0 / graft.functions.DetLnImpl.eval(x._1.toLong)),
        ds.foldLeft(0.0)((a, x) => a + 1.0 / x._1.toDouble)))
    }).toMap
    val got = Graph.linkPredict(edges.toDF("src", "dst"),
        topK = 1000).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (n, aa, ra)) =>
      assert(got(k)._1 == n, s"$k n_common")
      assert(got(k)._2 == aa, s"$k aa (bit-identical sorted fold)")
      assert(got(k)._3 == ra, s"$k ra")
    }
  }
}
