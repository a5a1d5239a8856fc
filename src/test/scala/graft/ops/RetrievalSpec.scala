package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** N4 — BM25 retrieval: scoring semantics on a hand-computable corpus
  * plus the plan-shape guarantees (no nested-loop join from the
  * corpus-stats re-join, top-k plans as TakeOrderedAndProject).
  */
class RetrievalSpec extends SparkSuite {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "spark spark spark filler filler filler"),
      (2L, "spark stream filler filler filler filler"),
      (3L, "filler stream stream stream filler filler"),
      (4L, "filler filler filler filler filler filler"),
      (5L, "vector filler filler filler filler filler"))
      .toDF("doc_id", "text")
  }

  test("bm25TopK ranks term-dense docs first; per-term partials are " +
    "exact rationals") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("spark", "stream", "vector"), k = 10)
      .orderBy("rk").collect()
    // doc 4 has no query term → absent entirely
    assert(out.map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 5L))
    // all docs have dl=6 → length normalization is uniform and the
    // scores are hand-checkable. N=5, SL=30.
    // idf(spark): df=2 → (2*(5-2)+1)/(2*2+1) = 7/5
    // sat(tf=3): 44*3*30 / (20*3*30 + 6*30 + 18*6*5) = 3960/2520
    val r1 = out.find(_.getLong(0) == 1L).get
    val sSpark = r1.getDouble(r1.fieldIndex("s_spark"))
    assert(math.abs(sSpark - (7.0 / 5.0) * (3960.0 / 2520.0)) < 1e-12)
    assert(r1.getDouble(r1.fieldIndex("s_stream")) === 0.0)
    // hand-computed totals: doc5 = idf(vector)=9/3 × sat(1)=1 → 3.0;
    // doc2 = 7/5·1 + 7/5·1 = 2.8; doc1 = doc3 = 7/5 × 3960/2520 = 2.2
    // (exact tie — same rationals) broken by doc_id
    val ranks = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(5L) == 1L, s"rare term (df=1) dominates: $ranks")
    assert(ranks(2L) == 2L, s"two mid-idf hits beat tf=3 on one: $ranks")
    assert(ranks(1L) == 3L && ranks(3L) == 4L,
      s"exact-tie broken by doc_id: $ranks")
  }

  test("bm25TopK with a term absent from the corpus contributes zero " +
    "everywhere and breaks nothing") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("spark", "unicorn"), k = 10).collect()
    assert(out.nonEmpty)
    assert(out.forall(r =>
      r.getDouble(r.fieldIndex("s_unicorn")) === 0.0))
  }

  test("bm25TopK ties break by doc_id and k truncates") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("spark"), k = 1).collect()
    assert(out.length === 1 && out.head.getLong(0) === 1L)
  }

  test("bm25TopK plan: no nested-loop join, global top-k is " +
    "TakeOrderedAndProject") {
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("spark", "stream"), k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"corpus-stats re-join must be a hash join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must not global-sort:\n$plan")
  }

  test("phraseSearch: positional adjacency, overlaps, duplicate terms") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the table part is here and the table part again"),
      (2L, "table part"),
      (3L, "part table"),            // reversed — no match
      (4L, "table filler part"),     // gap — no match
      (5L, "a a a"),                 // "a a" matches twice (overlap)
      (6L, "table"))                 // prefix only — no match
      .toDF("doc_id", "text")

    val two = Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("table", "part")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(two === Map(
      1L -> ((2L, 1L)),   // positions 1 and 7
      2L -> ((1L, 0L))),
      s"adjacency must be exact and ordered: $two")

    val dup = Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("a", "a")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dup === Map(5L -> ((2L, 0L))),
      s"'a a' in 'a a a' overlaps twice: $dup")

    // a phrase longer than any document matches nothing and the
    // start>=0 guard kills phantom negative starts
    assert(Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("table", "part", "is", "here", "and", "the", "table", "part",
        "again", "overrun")).collect().isEmpty)
  }

  test("phraseSearch plan: postings filter precedes the explode; the " +
    "match check is one aggregation, never a join chain") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val qe = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("x", "y", "z")).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Join"),
      s"slot aggregation replaces the n-way adjacency join:\n$plan")
    // the postings filter runs BEFORE the slot explode (scan-side kill
    // of non-phrase tokens), and exactly two exchanges remain:
    // (doc,start) slot check + per-doc rollup — no count(DISTINCT)
    // expand layer
    assert(plan.indexOf("Filter tok") > plan.indexOf("element_at") ||
      plan.indexOf("IN (x,y,z)") > 0, s"postings filter missing:\n$plan")
    assert(!plan.contains("Expand"),
      s"plain count must replace count(DISTINCT slot):\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly 2 shuffles:\n$plan")
  }

  test("hardNegatives: nearest different-label wins; same-label twins " +
    "and self are excluded") {
    val s = spark
    import s.implicits._
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    // anchor 1 (label 0): identical twin 2 shares its label (must be
    // excluded); 3 is close but label 1 (the hard negative); 4 is
    // orthogonal label 1 (an easy negative, ranked after 3)
    val emb = Seq(
      (1L, v(1, 0, 0), 0),
      (2L, v(1, 0, 0), 0),
      (3L, v(0.9, 0.1, 0), 1),
      (4L, v(0, 1, 0), 1))
      .toDF("vec_id", "embedding", "label")
    val anchors = emb.filter(col("vec_id") === 1L)
    val out = Similarity.hardNegatives(emb, anchors, "vec_id",
        "embedding", "label", k = 2)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 4L),
      s"hard negative 3 ranks before easy negative 4: ${out.toSeq}")
    assert(out.forall(_.getInt(2) === 1), "negatives carry their label")
    assert(out.forall(r => r.getLong(1) != 2L),
      "same-label twin is never a negative")
  }

  test("semanticDedup: within-cell near-dups drop to the min id; " +
    "cross-cell twins are untouched by construction") {
    val s = spark
    import s.implicits._
    // two tight clusters far apart → k-means (k=2) separates them;
    // within cluster A vectors 1,2,3 are near-identical (cos ~1),
    // cluster B's 10 is alone; 11 is A-like but negated → own cell
    // or anti-correlated (cos < 0) — never suppressed
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    val emb = Seq(
      (1L, v(1, 0, 0, 0.01)), (2L, v(1, 0, 0, 0.02)),
      (3L, v(0.99, 0, 0, 0.0)),
      (10L, v(0, 1, 0, 0.0)),
      (11L, v(-1, 0, 0, 0.0)))
      .toDF("vec_id", "embedding")
    val cts = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nCentroids = 2)
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        cts, tau = 0.9)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(4),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(1L) === ((true, -1L)), s"min id keeps: $out")
    assert(out(2L) === ((false, 1L)), s"suppressed by 1: $out")
    assert(out(3L) === ((false, 1L)), s"suppressed by 1: $out")
    assert(out(10L)._1 && out(11L)._1,
      s"singleton and anti-correlated keep: $out")
  }

  test("semanticDedup pair cost is within-cell only: the pair filter " +
    "joins on the cell key, never all-pairs") {
    val s = spark
    import s.implicits._
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    val emb = Seq((1L, v(1, 0)), (2L, v(0, 1)))
      .toDF("vec_id", "embedding")
    val cts = Similarity.trainCentroids(emb, "vec_id", "embedding", 2)
    val plan = Similarity.semanticDedup(emb, "vec_id", "embedding",
        cts, tau = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"within-cell pairs must equi-join on cell:\n$plan")
  }

  test("docKeywords: hand-computed tf·N/df ranking, rare terms rise, " +
    "ties break on term") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha alpha beta common"),
      (2L, "beta common common gamma"))
      .toDF("doc_id", "text")
    val out = Retrieval.docKeywords(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) ->
        ((r.getAs[String]("term"), r.getAs[Double]("score")))).toMap
    // N=2; df: alpha 1, beta 2, common 2, gamma 1
    assert(out((1L, 1L)) == (("alpha", 4.0)))
    assert(out((1L, 2L)) == (("beta", 1.0)))   // 1.0 tie → term asc
    assert(out((1L, 3L)) == (("common", 1.0)))
    assert(out((2L, 1L)) == (("common", 2.0))) // 2.0 tie → term asc
    assert(out((2L, 2L)) == (("gamma", 2.0)))
    assert(out((2L, 3L)) == (("beta", 1.0)))
    assert(out.size == 6)
  }

  test("hybridTopK: both-arm docs outrank single-arm ones at equal " +
      "ranks; single-arm docs still surface; rrf is the two-term sum") {
    val s = spark
    import s.implicits._
    // doc 1 matches the sparse terms AND is the dense nearest (its
    // text IS the query); doc 2 only matches terms; doc 3 is dense-
    // close but term-free; doc 4 irrelevant
    val q = "spark stream"
    val docs = Seq(
      (1L, "spark stream"),
      (2L, "spark stream extra words here beyond"),
      (3L, "spark strean"),
      (4L, "entirely unrelated text about nothing"))
      .toDF("doc_id", "text")
    val sig = graft.functions.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(q),
        org.apache.spark.sql.types.StringType))
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    val out = Retrieval.hybridTopK(docs, "doc_id", "text",
        Seq("spark", "stream"), (sig(0), sig(1)), k = 4, poolK = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rk"), r.getAs[Double]("rrf"),
          Option(r.getAs[Any]("rk_sparse")),
          Option(r.getAs[Any]("rk_dense")))).toMap
    assert(out(1L)._1 == 1L, "both-arm best doc fuses to rank 1")
    val (_, rrf1, Some(s1), Some(d1)) = out(1L)
    assert(rrf1 == 1.0 / (60 + s1.asInstanceOf[Long]) +
      1.0 / (60 + d1.asInstanceOf[Long]))
    // the term-free doc 4 never enters the sparse arm but still
    // surfaces through the dense pool (poolK covers it here)
    assert(out(4L)._3.isEmpty && out(4L)._4.nonEmpty)
    // doc 3 ("spark strean") hits ONE term — both arms ranked
    assert(out(3L)._3.nonEmpty && out(3L)._4.nonEmpty)
  }

  test("lateInteractionTopK: per-term best-chunk MaxSim — a doc " +
      "answering both terms in different chunks beats one repeating " +
      "a single term") {
    val s = spark
    import s.implicits._
    def sigOf(t: String): (Long, Long) = {
      val a = graft.functions.SimHash64(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType))
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      (a(0), a(1))
    }
    // doc 1: one chunk exactly "alpha", one exactly "beta" — both
    // terms get hamming 0 somewhere → perfect MaxSim 128.
    // doc 2: two chunks both exactly "alpha" — term beta never
    // matches a chunk at distance 0.
    val chunks = Seq(
      (1L, 0L, "alpha"), (1L, 1L, "beta"),
      (2L, 0L, "alpha"), (2L, 1L, "alpha"))
      .toDF("doc_id", "chunk_idx", "chunk_text")
    val sigs = chunks.select(col("doc_id"), col("chunk_idx"),
        graft.functions.GraftFunctions.simhash64(col("chunk_text"))
          .as("sg"))
      .select(col("doc_id"), col("chunk_idx"),
        element_at(col("sg"), 1).as("sim_lo"),
        element_at(col("sg"), 2).as("sim_hi"))
    val out = Retrieval.lateInteractionTopK(sigs,
        Seq(sigOf("alpha"), sigOf("beta")), k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rk"), r.getAs[Long]("score"),
          r.getAs[Long]("h_0"), r.getAs[Long]("h_1"))).toMap
    assert(out(1L) == ((1L, 128L, 0L, 0L)),
      "both terms matched perfectly in different chunks")
    assert(out(2L)._3 == 0L && out(2L)._4 > 0L &&
      out(2L)._2 < 128L, "repeating one term can't cover the other")
  }

  test("prfSearch: expansion mines the feedback co-occurrers and " +
      "round 2 equals bm25TopK over the sorted union") {
    val s = spark
    import s.implicits._
    // seed 'ml' hits docs 1-3, which all carry 'tensor' (and two carry
    // 'graph'); doc 4 has tensor but no seed — PRF should surface it
    val docs = Seq(
      (1L, "ml tensor graph a a"),
      (2L, "ml tensor b b b"),
      (3L, "ml tensor graph c"),
      (4L, "tensor tensor graph d"),
      (5L, "unrelated words only here"),
      (6L, "more unrelated filler text")
    ).toDF("doc_id", "text")
    val got = Retrieval.prfSearch(docs, "doc_id", "text",
        Seq("ml"), k = 6, feedbackDocs = 3, expand = 2, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // expansion = {tensor (3 feedback docs), graph (2)} →
    // round 2 over [graph, ml, tensor]
    val expect = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("graph", "ml", "tensor"), k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
    assert(got.contains(4L), "PRF must recall the seed-less doc")
    assert(!got.contains(5L) && !got.contains(6L))
  }

  test("trigramSearch: candidate pruning never loses a match, and a " +
      "doc holding all trigrams non-contiguously is verified away") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "xx sort table yy"),            // match at pos 4
      (2L, "sort table"),                  // match at pos 1
      (3L, "sort tx z table"), // all 8 trigrams present, NO substring
      (4L, "nothing relevant"),
      (5L, "so")                           // shorter than a trigram
    ).toDF("doc_id", "text")
    val got = Retrieval.trigramSearch(docs, "doc_id", "text",
        "sort table")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 4L), (2L, 1L)))
    // doc 3 is the pg_trgm false positive: every trigram of the
    // pattern occurs, but instr rejects it — candidates only, never
    // the verdict
    val cands = Retrieval.trigramSearch(docs, "doc_id", "text",
      "sort table") // (sanity that the call is deterministic)
    assert(cands.collect().length == 2)
  }
}
