package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iterative graph operators on DataFrames — the Pregel-lite family a
  * crawl-scale training-data pipeline needs (link-graph authority is a
  * first-class quality signal in CommonCrawl-style corpus curation:
  * harmonic/PageRank centrality feeds the per-domain keep/drop call).
  *
  * Design for 100 TB: one shuffle join per iteration keyed by node id
  * (ranks and edges hash-partition on the same key, so AQE reuses the
  * exchange), contributions computed per-edge then summed — integer
  * arithmetic throughout, so the result is independent of partition
  * layout and replayable in SQL. No driver-side graph state: the
  * iteration count is a config constant, each step is a plain
  * join+aggregate over distributed frames.
  */
object Graph {

  /** Integer PageRank over an edge list, `iters` synchronous steps.
    *
    * Fixed-point arithmetic: every node starts at `base`; one step is
    *   rank'(v) = base·15/100 + 85·(Σ_{(u,v)∈E} rank(u) div odeg(u)) div 100
    * with Long `DIV` truncation — order-independent (each edge's
    * contribution is computed independently, integer sums commute), so
    * the result is bit-stable across shuffle layouts and exactly
    * replayable by a DuckDB fold. Dangling mass is dropped, not
    * redistributed (nodes with no out-edges leak their rank), the
    * standard simplification when ranks are used as a relative quality
    * ordering. `base` bounds the magnitude: Σ ranks ≤ n·base must stay
    * well under 2^63/85, so the default 1e12 is safe to ~10^8 nodes;
    * lower it for larger graphs.
    *
    * @param nodes one row per node (ranks are emitted for every node,
    *              including sinks that only receive)
    * @param edges (src, dst) rows; parallel edges are real multi-edges
    *              (each contributes, and each counts in out-degree)
    */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
               iters: Int = 3, base: Long = 1000000000000L): DataFrame = {
    val ids = nodes.select(col(idCol).cast(LongType).as("node"))
    val e = edges.select(col("src").cast(LongType), col("dst").cast(LongType))
    val odeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val withDeg = e.join(odeg, "src")
    var ranks = ids.withColumn("rank", lit(base))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank DIV odeg").as("c"))
      ranks = ids
        .join(contribs.groupBy("node").agg(sum("c").as("s")),
          Seq("node"), "left")
        .select(col("node"),
          (lit(base * 15L / 100L) + expr("coalesce(s, 0L) * 85 DIV 100"))
            .as("rank"))
    }
    ranks
  }

  /** Personalized PageRank — [[pageRank]] with the teleport mass
    * restricted to a SEED set (public: the topic-sensitive /
    * personalized variant, Haveliwala 2002): authority relative to a
    * trust list rather than the whole graph — the crawl-curation
    * companion of [[bfsDistance]]'s hop count (BFS says "how far from
    * the seeds", PPR says "how much seed authority flows here",
    * degree-weighted and damped). Same fixed-point integer arithmetic
    * as pageRank — rank'(v) = seed_v·base·15/100 +
    * 85·(Σ rank(u) div odeg(u)) div 100, seeds start at `base`,
    * non-seeds at 0 — so the result is layout-independent and
    * SQL-replayable round for round. Same one-shuffle-per-round
    * shape; `isSeed` is evaluated against `nodes` AS PASSED (write it
    * over idCol — the bfsDistance contract).
    */
  def personalizedPageRank(nodes: DataFrame, idCol: String,
                           edges: DataFrame,
                           isSeed: org.apache.spark.sql.Column,
                           iters: Int = 3,
                           base: Long = 1000000000000L): DataFrame = {
    val ids = nodes.select(col(idCol).cast(LongType).as("node"),
      isSeed.as("seed"))
    val e = edges.select(col("src").cast(LongType),
      col("dst").cast(LongType))
    val odeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val withDeg = e.join(odeg, "src")
    var ranks = ids.withColumn("rank",
      when(col("seed"), lit(base)).otherwise(lit(0L)))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"), expr("rank DIV odeg").as("c"))
      ranks = ids
        .join(contribs.groupBy("node").agg(sum("c").as("s")),
          Seq("node"), "left")
        .select(col("node"), col("seed"),
          (when(col("seed"), lit(base * 15L / 100L)).otherwise(lit(0L))
            + expr("coalesce(s, 0L) * 85 DIV 100")).as("rank"))
    }
    ranks.select(col("node"), col("seed"), col("rank"))
  }

  /** HITS hubs and authorities — the mutually-recursive pair beside
    * [[pageRank]]'s single authority score (public: Kleinberg 1999):
    * a good HUB points at good authorities, a good AUTHORITY is
    * pointed at by good hubs — the directory-page vs content-page
    * split PageRank can't make. Integer fixed point like pageRank:
    * each round a(v) = Σ_{u→v} h(u) then h(u) = Σ_{u→v} a(v), and
    * each side renormalizes by its MAX — score' = score·base div max
    * — so magnitudes stay bounded, every step is exact integer
    * arithmetic (the product runs in DECIMAL(38,0) so n·base²
    * headroom holds to ~1e19 nodes; max is deterministic, div
    * truncates), and the
    * result is layout-independent and SQL-replayable round for
    * round. One shuffle join per half-round. Output:
    * (node, hub, authority).
    */
  def hits(nodes: DataFrame, idCol: String, edges: DataFrame,
           iters: Int = 3, base: Long = 1000000000L): DataFrame = {
    val ids = nodes.select(col(idCol).cast(LongType).as("node"))
    val e = edges.select(col("src").cast(LongType),
      col("dst").cast(LongType))
    var h = ids.withColumn("hub", lit(base))
    var a = ids.withColumn("auth", lit(0L))
    for (_ <- 1 to iters) {
      val aRaw = ids.join(
          e.join(h.select(col("node").as("src"), col("hub")), "src")
            .groupBy(col("dst").as("node"))
            .agg(sum(col("hub")).as("s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("raw"))
      val aMax = aRaw.agg(max(col("raw")).as("m"))
        .withColumn("__jk", pmod(xxhash64(col("m")), lit(1L)))
      a = aRaw.withColumn("__jk", pmod(xxhash64(col("raw")), lit(1L)))
        .join(broadcast(aMax), Seq("__jk"))
        .select(col("node"),
          when(col("m") > 0L, expr(s"CAST(raw AS DECIMAL(38,0)) * ${base}L DIV m"))
            .otherwise(lit(0L)).as("auth"))
        .localCheckpoint()
      val hRaw = ids.join(
          e.join(a.select(col("node").as("dst"), col("auth")), "dst")
            .groupBy(col("src").as("node"))
            .agg(sum(col("auth")).as("s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("raw"))
      val hMax = hRaw.agg(max(col("raw")).as("m"))
        .withColumn("__jk", pmod(xxhash64(col("m")), lit(1L)))
      h = hRaw.withColumn("__jk", pmod(xxhash64(col("raw")), lit(1L)))
        .join(broadcast(hMax), Seq("__jk"))
        .select(col("node"),
          when(col("m") > 0L, expr(s"CAST(raw AS DECIMAL(38,0)) * ${base}L DIV m"))
            .otherwise(lit(0L)).as("hub"))
        .localCheckpoint()
    }
    h.join(a, "node").select(col("node"), col("hub"), col("auth"))
  }

  /** Per-node triangle counts and local clustering coefficient over an
    * undirected simple graph — the link-farm / dedup-cluster density
    * signal next to [[pageRank]]'s authority (a domain whose neighbors
    * all interlink is a farm; a dedup cluster whose members all pair
    * is a true duplicate clique, not a chain of borderline matches).
    *
    * Algorithm: degree-ordered edge orientation (the standard
    * distributed triangle enumeration — Suri & Vassilvitskii 2011,
    * public). Each canonical edge {a,b} is oriented from its
    * (degree, id)-smaller endpoint, which caps oriented out-degree at
    * O(√m); wedges are out-neighbor pairs of one source (Σ od(v)² ≤
    * m^1.5 worst case, far less in practice), and a triangle is a
    * wedge whose closing pair is itself an edge — each triangle
    * surfaces EXACTLY once, at its (degree, id)-minimal vertex, so no
    * post-dedup pass is needed. Everything is equi-joins + hash
    * aggregates on node/pair keys; integer arithmetic throughout, the
    * one double (lcc = 2T/(d(d−1))) is a single division of exact
    * BIGINTs.
    *
    * @param nodes one row per node; isolated nodes emit (degree 0,
    *              0 triangles, lcc 0.0)
    * @param edges (src, dst) rows, direction ignored; parallel edges
    *              and self-loops are dropped by canonicalization
    */
  def triangles(nodes: DataFrame, idCol: String,
                edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).cast(LongType).as("a"),
        greatest(col("src"), col("dst")).cast(LongType).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("t")))
          .otherwise(struct(col("b").as("s"), col("a").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedge (s; x<y by id) closed iff {x,y} is a canonical edge — the
    // id order on the pair matches und's (a<b) key, so the closing
    // probe is a plain equi-join
    val wedges = oriented.select(col("s"), col("t").as("x"))
      .join(oriented.select(col("s"), col("t").as("y")), "s")
      .where(col("x") < col("y"))
    val tris = wedges.join(und,
      wedges("x") === und("a") && wedges("y") === und("b"))
      .select(col("s"), col("x"), col("y"))
    val perNode = tris.select(col("s").as("node"))
      .unionAll(tris.select(col("x").as("node")))
      .unionAll(tris.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    nodes.select(col(idCol).cast(LongType).as("node"))
      .join(deg, Seq("node"), "left")
      .join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("lcc",
        when(col("degree") >= 2L,
          (col("n_tri") * 2L).cast(DoubleType) /
            (col("degree") * (col("degree") - 1L)).cast(DoubleType))
          .otherwise(lit(0.0)))
  }

  /** Bounded-hop BFS distance from a seed set — the reachability /
    * crawl-depth primitive next to [[pageRank]] (authority),
    * [[triangles]] (density), and Dedup's components (identity):
    * "how many link hops from the trusted seed list is this page" is
    * a first-class corpus quality signal (seed-distance filtering in
    * crawl curation).
    *
    * Frontier expansion, not whole-graph relaxation: each round joins
    * EDGES against only the nodes discovered last round, anti-joins
    * away already-settled nodes, and stamps the new frontier with the
    * round number — per-round cost is O(edges touching the frontier),
    * the property that makes hop-bounded BFS tractable when the graph
    * is 10^11 edges and the frontier is thousands. Lineage truncates
    * per round (the componentMin pattern) so the planner never sees a
    * nested join tree. Unreached nodes report dist = -1 (an explicit
    * verdict, not an absent row).
    *
    * `isSeed` is evaluated against `nodes` as passed — write it over
    * `idCol` (or any other column of the caller's frame), e.g.
    * `col("doc_id") < 5L`.
    */
  def bfsDistance(nodes: DataFrame, idCol: String, edges: DataFrame,
                  isSeed: org.apache.spark.sql.Column,
                  maxHops: Int = 3): DataFrame = {
    val ids = nodes.select(col(idCol).cast(LongType).as("node"))
    val e = edges.select(col("src").cast(LongType),
      col("dst").cast(LongType))
    // isSeed is evaluated against `nodes` AS PASSED — write it over
    // idCol (or any column of the caller's frame). The seed filter
    // runs before the internal rename so a predicate never has to
    // know the op's private `node` alias.
    var settled = nodes.where(isSeed)
      .select(col(idCol).cast(LongType).as("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = settled.select(col("node"))
    for (hop <- 1 to maxHops) {
      val next = e.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(settled.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(hop.toLong).as("dist"))
        .localCheckpoint()
      settled = settled.unionAll(next).localCheckpoint()
      frontier = next.select(col("node"))
    }
    ids.join(settled, Seq("node"), "left")
      .select(col("node"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  /** Deterministic synthetic out-links for a dense-id node set — the
    * fixture stand-in for a real crawl link graph (the corpus tables
    * carry no hyperlinks). Each node emits `outLinks` edges
    *   m = (id·1103515245 + j·12345) mod (n−1),  dst = m + [m ≥ id]
    * (the +[·] shift excludes self-loops), all affine-mod integer ops
    * a SQL oracle reproduces verbatim. Real deployments pass their own
    * edge list straight to [[pageRank]].
    */
  /** Bounded-round k-core peel — the graph-density filter next to
    * [[triangles]] (local density) and [[pageRank]] (authority): a
    * node is in the k-core iff it survives iterated removal of nodes
    * with degree < k over the UNDIRECTED distinct edge set. Spam/link
    * farms and weakly-attached crawl fringe peel off; the dense core
    * that remains is the high-trust subgraph.
    *
    * Each round is one semi-join-restricted degree aggregate over the
    * surviving edges and one filter — O(edges) per round, lineage
    * truncated per round (the componentMin discipline). `iters`
    * bounds the peel depth; like componentMin, the contract is
    * bounded-round (the oracle replays the same rounds verbatim) —
    * at web scale a few rounds remove the overwhelming fringe mass
    * and the fixpoint tail is scheduled, not unbounded.
    *
    * Output: every input node with its (undirected, deduped) initial
    * degree and the post-peel verdict.
    */
  def kCore(nodes: DataFrame, idCol: String, edges: DataFrame,
            k: Int, iters: Int = 6): DataFrame = {
    require(k >= 1 && iters >= 1)
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // re-read every round
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .unionAll(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var alive = nodes.select(col(idCol).cast(LongType).as("node"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val e = und
        .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
      alive = alive
        .join(degrees(e).filter(col("deg") >= k), Seq("node"),
          "left_semi")
        .localCheckpoint()
    }
    nodes.select(col(idCol).cast(LongType).as("node"))
      .join(degrees(und).select(col("node"), col("deg")), Seq("node"),
        "left")
      .join(alive.select(col("node"), lit(true).as("core")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("degree"),
        coalesce(col("core"), lit(false)).as("in_kcore"))
  }

  /** Bounded-round synchronous label propagation — COMMUNITIES, where
    * [[Dedup.componentMin]] finds components and [[kCore]] finds the
    * dense core: each round every node adopts the most frequent label
    * among its neighbors (ties → smallest label, so the result is
    * deterministic and SQL-replayable), seeded with node ids. On a
    * connected graph bounded rounds yield dense clusters long before
    * min-label flooding would merge everything — the topic/community
    * signal of link analysis.
    *
    * Per round: one edge→label join, one (node, label) count
    * aggregate, one per-node argmax (max of struct(cnt, −label) — no
    * window), lineage truncated per round. Output: (node, community).
    */
  def labelPropagation(nodes: DataFrame, idCol: String,
                       edges: DataFrame, iters: Int = 4): DataFrame = {
    val e = edges.select(col("src").cast(LongType),
      col("dst").cast(LongType))
    val sym = e.union(e.select(col("dst").as("src"),
        col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .persist()
    var labels = nodes
      .select(col(idCol).cast(LongType).as("node"),
        col(idCol).cast(LongType).as("lbl"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val counts = sym
        .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .groupBy(col("src"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      val pick = counts.groupBy(col("src").as("node"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("new_lbl"))
      labels = labels
        .join(pick, Seq("node"), "left_outer")
        .select(col("node"),
          coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    sym.unpersist()
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** Link prediction over an undirected graph — the "which edges are
    * missing" ranking (recommendation, knowledge-graph completion,
    * crawl-frontier priority) next to [[pageRank]]'s authority and
    * [[triangles]]' density. For every NON-adjacent pair (u, v) with
    * at least one common neighbor, two published neighborhood scores:
    * Adamic–Adar Σ_w 1/ln(deg w) (Adamic & Adar 2003) and resource
    * allocation Σ_w 1/deg w (Zhou/Lü/Zhang 2009) — RA damps hub
    * neighbors harder; both beat raw common-neighbor counts on most
    * graphs. Top `topK` pairs by AA, ties by (node_a, node_b).
    *
    * Scale shape: the wedge join is keyed by the CENTER w, so per-task
    * width is Σ deg(w)² over that task's nodes — the degree-bounded
    * wedge census, the same frontier-not-corpus bound as [[triangles]]
    * (a true hub would need the same degree cap documented there);
    * already-adjacent pairs leave via one anti-join against the unique
    * edge set; the final top-k is TakeOrderedAndProject, never a
    * global sort. Determinism: a common neighbor is adjacent to both
    * u and v, so deg(w) ≥ 2 and ln(deg) > 0 — and both score folds run
    * over the per-pair witness list sorted by (deg, w), one
    * written-down IEEE order the oracle replays via ordered list
    * aggregation; ln routes through [[graft.functions.DetLn]] — the
    * libm-free series that is bit-identical cross-engine at ANY
    * degree (library lns disagree in the last ulp on some integers,
    * e.g. Math.log vs the oracle first differ at 9170 — a real hub
    * degree).
    */
  def linkPredict(edges: DataFrame, topK: Int = 50): DataFrame = {
    val e = edges.select(col("src").cast(LongType),
      col("dst").cast(LongType)).where(col("src") =!= col("dst"))
    val uniq = e.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
      .persist()
    val sym = uniq.select(col("a").as("node"), col("b").as("nbr"))
      .union(uniq.select(col("b").as("node"), col("a").as("nbr")))
    val deg = sym.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val nb = sym.join(deg, "node")
    val wedges = nb
      .select(col("node").as("w"), col("deg"), col("nbr").as("u"))
      .join(nb.select(col("node").as("w"), col("nbr").as("v")),
        Seq("w"))
      .where(col("u") < col("v"))
    val cand = wedges.join(
      uniq.select(col("a").as("u"), col("b").as("v")),
      Seq("u", "v"), "left_anti")
    val out = cand.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"),
        sort_array(collect_list(struct(col("deg"), col("w"))))
          .as("ws"))
      .select(col("u").as("node_a"), col("v").as("node_b"),
        col("n_common"),
        aggregate(col("ws"), lit(0.0), (acc, x) =>
          acc + lit(1.0) / graft.functions.GraftFunctions.detLn(
            x.getField("deg")))
          .as("aa_score"),
        aggregate(col("ws"), lit(0.0), (acc, x) =>
          acc + lit(1.0) / x.getField("deg").cast(DoubleType))
          .as("ra_score"))
      .orderBy(col("aa_score").desc, col("node_a"), col("node_b"))
      .limit(topK)
    out
  }

  def syntheticLinks(nodes: DataFrame, idCol: String, n: Long,
                     outLinks: Int = 3): DataFrame =
    nodes.select(col(idCol).cast(LongType).as("src"))
      .select(col("src"),
        explode(array((1 to outLinks).map(lit(_)): _*)).as("j"))
      .withColumn("m",
        (col("src") * lit(1103515245L) + col("j") * lit(12345L))
          % lit(n - 1))
      .select(col("src"),
        when(col("m") >= col("src"), col("m") + 1)
          .otherwise(col("m")).as("dst"))

  /** Degree assortativity (public: Newman 2002) over the undirected
    * simple graph — do high-degree nodes link to other hubs (r > 0,
    * social-network shape) or to leaves (r < 0, web/link-farm shape)?
    * The one-number mixing diagnostic beside [[triangles]]' local
    * density and [[pageRank]]'s authority: crawl frontiers and dedup
    * clusters behave differently on assortative vs disassortative
    * link graphs, so it's the first thing to check before tuning
    * either.
    *
    * Pearson r over the degree pairs at edge ends, each undirected
    * edge counted in BOTH orientations, so the two marginals coincide
    * and r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) with M = 2|E| — every
    * moment an exact BIGINT sum (degree is a count), ONE final
    * division. Shape: one dedup aggregate to the undirected edge set,
    * one degree census, two node-keyed equi joins (degree frame is
    * node-sized — Spark broadcasts it when it fits, shuffles
    * otherwise), one moment fold. Nothing quadratic anywhere.
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val u = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = u.select(col("a").as("node"))
      .unionAll(u.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val dir = u.select(col("a").as("s"), col("b").as("t"))
      .unionAll(u.select(col("b").as("s"), col("a").as("t")))
    dir
      .join(deg.select(col("node").as("s"), col("degree").as("x")), "s")
      .join(deg.select(col("node").as("t"), col("degree").as("y")), "t")
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("m"), col("sx"), col("sxy"), col("sxx"),
        ((col("m") * col("sxy") - col("sx") * col("sx"))
          .cast(DoubleType) /
          (col("m") * col("sxx") - col("sx") * col("sx"))
            .cast(DoubleType)).as("r"))
  }
}
