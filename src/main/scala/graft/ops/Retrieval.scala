package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N4 extension — keyword retrieval over the document corpus: BM25
  * ranking with a fixed query-term set, the lookup side of a
  * training-data pipeline (find documents about X; score contamination
  * probes; build weak-supervision seed sets).
  *
  * Scoring is the BM25 shape (Robertson et al., TREC-3) with one
  * deliberate deviation: the idf factor is the exact RATIO
  * `(N - df + 1/2) / (df + 1/2)` rather than its logarithm. Both are
  * monotone decreasing in df, so single-term ranking is identical;
  * the ratio form keeps every factor an exact int64-derived quantity
  * whose double image is reproducible bit-for-bit across engines
  * (IEEE division and multiplication are correctly rounded; `ln` is
  * not guaranteed to be), which is what lets the DuckDB oracle
  * hash-match the score column instead of settling for a rows-only
  * check. k1 = 6/5 and b = 3/4 are cleared to integer numerator /
  * denominator pairs the same way — see `satNum`/`satDen` below.
  *
  * Scale shape: tokens are filtered to the query terms INSIDE the
  * array before exploding (the explode emits at most |terms| rows per
  * doc, not |tokens|); corpus stats (N, total length) are a one-row
  * aggregate collected driver-side and embedded as literals (the
  * trainCentroids precedent — bounded regardless of corpus size), and
  * per-term document frequencies broadcast back via a term-key hash
  * join — no nested-loop join anywhere. The final global top-k plans
  * as TakeOrderedAndProject (no full sort), and the rank window runs
  * over the k collected survivors only.
  */
object Retrieval {

  /** Per-(doc, term) BM25 factors with k1 = 6/5, b = 3/4, cleared to
    * exact integers over the common denominator 20·SL:
    *   tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/SL))
    *     = 44·tf·SL / (20·tf·SL + 6·SL + 18·dl·N)
    */
  private def satNum(tf: org.apache.spark.sql.Column,
                     sl: org.apache.spark.sql.Column) =
    lit(44L) * tf * sl
  private def satDen(tf: org.apache.spark.sql.Column,
                     sl: org.apache.spark.sql.Column,
                     dl: org.apache.spark.sql.Column,
                     n: org.apache.spark.sql.Column) =
    lit(20L) * tf * sl + lit(6L) * sl + lit(18L) * dl * n

  /** Top-k documents for `terms`, scored by rational-idf BM25. Output:
    * (doc_id, rk, score, s_<term>...) — the per-term partial scores are
    * kept as columns so a ranking is explainable, and so the
    * cross-term sum has one fixed, written-down association order
    * (left-to-right over `terms`) that the oracle replicates verbatim.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct, "distinct terms")
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("dl"),
        filter(col("toks"), t => t.isInCollection(terms)).as("hits"))
    // one-row corpus stats, collected driver-side and embedded as
    // literals — the trainCentroids precedent: a bounded pre-pass
    // (Catalyst folds a lit(1)-keyed re-join back into a BNLJ, so a
    // join can't carry a constant row without a scale-smell plan)
    val statsRow = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_len")).head()
    val nDocs = lit(statsRow.getLong(0))
    val sumLen = lit(statsRow.getLong(1))
    val tf = toks.filter(size(col("hits")) > 0)
      .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .withColumn("score_t",
        ((lit(2L) * (nDocs - col("df")) + lit(1L)).cast(DoubleType)
          / (lit(2L) * col("df") + lit(1L)).cast(DoubleType))
        * (satNum(col("tf"), sumLen).cast(DoubleType)
          / satDen(col("tf"), sumLen, col("dl"), nDocs)
              .cast(DoubleType)))
    val perTerm = terms.map(t =>
      coalesce(max(when(col("term") === t, col("score_t"))), lit(0.0))
        .as(s"s_$t"))
    val pivoted = scored.groupBy("doc_id")
      .agg(perTerm.head, perTerm.tail: _*)
    // left-to-right over `terms` — the documented association order
    val total = terms.map(t => col(s"s_$t")).reduceLeft(_ + _)
    val top = pivoted.withColumn("score", total)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast(LongType))
      .select(col("doc_id") +: col("rk") +: col("score") +:
        terms.map(t => col(s"s_$t")): _*)
  }

  /** Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al. 2009,
    * public): fuse the SPARSE ranking ([[bm25TopK]], rational-idf
    * BM25) and a DENSE ranking (64-bit SimHash sign-embedding hamming
    * — the rag_chunk_search geometry at doc grain) of the same query,
    * rrf(d) = Σ_r 1/(kRrf + rank_r(d)) over the rankings that
    * retrieved d in their top `poolK` — the standard RAG fusion that
    * needs no score calibration between incomparable scales, only
    * RANKS (which are exact integers here, so every fused score is a
    * fixed two-term IEEE tree of correctly-rounded divisions — bit-
    * identical across engines).
    *
    * Shape: each arm is its own bounded top-poolK
    * (TakeOrderedAndProject; the rank windows run over ≤ poolK rows);
    * the fusion is one join of two poolK-row frames. At 100 TB each
    * arm swaps to its served form (text_index_store / ann_index_store
    * probes) and the fusion cost is unchanged — it never touches the
    * corpus.
    */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], querySig: (Long, Long),
                 k: Int = 10, poolK: Int = 50,
                 kRrf: Long = 60L): DataFrame = {
    val sparse = bm25TopK(docs, idCol, textCol, terms, poolK)
      .select(col("doc_id"), col("rk").as("rk_sparse"))
    val hm = docs.select(col(idCol).as("doc_id"),
        graft.functions.GraftFunctions.simhash64(col(textCol)).as("sg"))
      .select(col("doc_id"),
        (bit_count(element_at(col("sg"), 1)
            .bitwiseXOR(lit(querySig._1))) +
          bit_count(element_at(col("sg"), 2)
            .bitwiseXOR(lit(querySig._2)))).cast(LongType).as("hamming"))
    val dense = hm.orderBy(col("hamming"), col("doc_id")).limit(poolK)
      .withColumn("rk_dense", row_number().over(
        Window.orderBy(col("hamming"), col("doc_id"))).cast(LongType))
      .select(col("doc_id"), col("rk_dense"))
    val arm = (rk: org.apache.spark.sql.Column) =>
      coalesce(lit(1.0).cast(DoubleType) /
        (lit(kRrf).cast(DoubleType) + rk.cast(DoubleType)), lit(0.0))
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        arm(col("rk_sparse")) + arm(col("rk_dense")))
    fused.orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))).cast(LongType))
      .select(col("doc_id"), col("rk"), col("rrf"),
        col("rk_sparse"), col("rk_dense"))
  }

  /** Late-interaction retrieval (the ColBERT MaxSim shape, public —
    * Khattab & Zaharia 2020) over sign embeddings: every query TOKEN
    * keeps its own vector and scores against the doc's best-matching
    * CHUNK, score(d) = Σ_t max_chunk sim(t, chunk) — so a doc that
    * answers different query terms in different passages outranks one
    * that merely repeats a single term, which any single-vector score
    * (hybrid_search's dense arm included) cannot distinguish.
    *
    * Geometry: 64-bit SimHash sign embeddings, sim = 64 − hamming —
    * exact integers end to end (the rag_chunk_search geometry, now
    * per-term). Shape: ONE hash aggregate over chunk signatures
    * computes every per-term min-hamming per doc (terms are a fixed
    * literal list, so they're columns, not a join), then a bounded
    * top-k. At scale the chunk-signature table is the persisted
    * artifact (rag_chunk_search materializes exactly this frame) and
    * the aggregate is map-side combinable.
    */
  def lateInteractionTopK(chunkSigs: DataFrame,
                          termSigs: Seq[(Long, Long)],
                          k: Int = 10): DataFrame = {
    require(termSigs.nonEmpty)
    val hams = termSigs.zipWithIndex.map { case ((lo, hi), i) =>
      min(bit_count(col("sim_lo").bitwiseXOR(lit(lo))) +
        bit_count(col("sim_hi").bitwiseXOR(lit(hi))))
        .cast(LongType).as(s"h_$i")
    }
    val perDoc = chunkSigs.groupBy(col("doc_id"))
      .agg(hams.head, hams.tail: _*)
    val score = termSigs.indices
      .map(i => lit(64L) - col(s"h_$i"))
      .reduceLeft(_ + _)
    perDoc.withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast(LongType))
      .select(col("doc_id") +: col("rk") +: col("score") +:
        termSigs.indices.map(i => col(s"h_$i")): _*)
  }

  /** Exact-phrase search over a positional inverted index — the
    * retrieval twin of bm25TopK for queries where token ORDER matters.
    *
    * One-shuffle formulation (not an n-way adjacency join chain):
    * postings for just the phrase's terms survive the scan (the
    * isInCollection filter runs in the codegen stage, so at 100 TB
    * the exploded stream is those terms' postings, not the corpus),
    * each posting emits one row per phrase SLOT its token could fill
    * (slot j at position p ⇒ candidate match start p−j), and a single
    * aggregation on (doc, start) checks that all `phrase.length`
    * distinct slots were filled. Duplicate terms in the phrase are
    * handled by construction: a token matching k slots emits k rows.
    * Overlapping matches count (positional semantics: "a a" matches
    * twice in "a a a").
    *
    * Output: one row per matching document —
    * (doc_id, n_matches, first_pos 0-based).
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val n = phrase.length
    val slots: Map[String, Seq[Int]] =
      phrase.zipWithIndex.groupBy(_._1).map { case (t, xs) =>
        t -> xs.map(_._2)
      }
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .filter(col("tok").isInCollection(phrase.distinct))
      .select(col("doc_id"), col("pos"),
        explode(element_at(typedLit(slots), col("tok"))).as("slot"))
      .select(col("doc_id"),
        (col("pos") - col("slot")).as("start"), col("slot"))
      .filter(col("start") >= 0)
      .groupBy(col("doc_id"), col("start"))
      // a start is a match iff every slot 0..n-1 was filled there.
      // Within a (doc, start) group each slot appears AT MOST once
      // (slot j here can only come from the posting at pos start+j),
      // so a plain count equals the distinct-slot count — no
      // count(DISTINCT) expand/extra shuffle needed
      .agg(count(lit(1)).as("n_slots"))
      .filter(col("n_slots") === n)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("start")).cast(LongType).as("first_pos"))
  }

  /** Top-k keywords per document by rational-idf TF-IDF — the
    * keyword-extraction / doc-tagging pass of a corpus pipeline
    * (weak labels, dedup explanations, index hints). Same log-free
    * discipline as [[bm25TopK]]: score = tf·N / df, one division of
    * exact BIGINTs per (doc, term), monotone in the textbook
    * tf·log(N/df) for single-term ranking so the top-k set per tf
    * tier is identical; `minLen` crudely drops the stopword tier
    * (a curated stoplist plugs into the same filter).
    *
    * Shape: per-(doc, term) counts → term-keyed df aggregate →
    * term-keyed equi-join (the standard tf-idf shuffle pair; df is
    * vocabulary-sized so it is NOT broadcast — at corpus scale the
    * vocabulary outgrows a driver ship), then the bounded-heap
    * GroupedTopK keeps k rows per doc with no per-doc sort. N comes
    * from a one-row pre-pass (the trainCentroids precedent).
    */
  def docKeywords(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 5, minLen: Int = 4): DataFrame = {
    val nDocs = docs.select(col(idCol)).count()
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .where(length(col("term")) >= minLen)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score",
        (col("tf") * lit(nDocs)).cast(DoubleType) /
          col("df").cast(DoubleType))
    graft.plans.GroupedTopK(scored, Seq("doc_id"),
      Seq(("score", false), ("term", true)), k, rankName = "rk")
      .select(col("doc_id"), col("rk"), col("term"), col("tf"),
        col("df"), col("score"))
  }

  /** Pseudo-relevance feedback (Rocchio-style query expansion): run
    * the seed query, mine the top `feedbackDocs` results for the
    * `expand` terms that co-occur in most of them (df-in-feedback ≥
    * `minDf`, ties broken lexically — the deterministic core of
    * PRF), and re-score with the expanded term set. The classic
    * recall lever when the seed query undershoots — no model, just
    * two [[bm25TopK]] passes and a bounded term census.
    *
    * Determinism contract: both rounds score over the LEXICALLY
    * SORTED term list, so the left-to-right IEEE fold has one
    * written-down association order the oracle replays
    * (`list(score_t ORDER BY term)` — the text_probe_stream fold).
    * The expansion census is a ≤`expand`-row driver read (the BPE
    * top-256 / centroid precedent), so round 2 carries the terms as
    * literals — at 100 TB both rounds stay index-shaped probes.
    *
    * Output: (doc_id, rk, score) — fixed schema regardless of what
    * expansion the data produced.
    */
  def prfSearch(docs: DataFrame, idCol: String, textCol: String,
                seedTerms: Seq[String], k: Int = 10,
                feedbackDocs: Int = 10, expand: Int = 3,
                minDf: Int = 2): DataFrame = {
    val seeds = seedTerms.distinct.sorted
    val top = bm25TopK(docs, idCol, textCol, seeds, feedbackDocs)
      .select(col("doc_id"))
    val grown = docs
      .select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .join(top, Seq("doc_id"), "left_semi")
      .select(explode(array_distinct(col("toks"))).as("term"))
      .filter(!col("term").isInCollection(seeds) && col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minDf)
      .orderBy(col("cnt").desc, col("term"))
      .limit(expand)
      .collect().map(_.getString(0))
    val all = (seeds ++ grown).distinct.sorted
    bm25TopK(docs, idCol, textCol, all, k)
      .select(col("doc_id"), col("rk"), col("score"))
  }

  /** Trigram-accelerated substring search — the pg_trgm pattern for
    * `LIKE '%pattern%'`, which no B-tree/term index can serve: a doc
    * can contain the pattern only if it contains EVERY one of the
    * pattern's character trigrams, so the trigram posting
    * intersection prunes the corpus to a candidate set and the exact
    * `instr` verify runs on survivors only. At 100 TB the posting
    * side is a PERSISTED trigram index maintained like
    * [[graft.sources.TextIndexStore]] (hash the grams, bucket by
    * gram); here it is built in-plan, which is the same shape minus
    * the store.
    *
    * Output: (doc_id, pos) for every doc containing `pattern`, pos =
    * 1-based first occurrence — exact, so the row hash-compares with
    * the oracle's full-scan strpos.
    */
  def trigramSearch(docs: DataFrame, idCol: String, textCol: String,
                    pattern: String): DataFrame = {
    require(pattern.length >= 3, "pattern needs at least one trigram")
    val grams = pattern.sliding(3).toSeq.distinct
    val tri = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .filter(length(col("t")) >= 3)
      .select(col("doc_id"), col("t"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3))))).as("g"))
    val cand = tri.filter(col("g").isin(grams: _*))
      .groupBy(col("doc_id"), col("t"))
      .agg(countDistinct(col("g")).as("ng"))
      .filter(col("ng") === grams.size.toLong)
    cand.select(col("doc_id"),
        instr(col("t"), pattern).cast(LongType).as("pos"))
      .filter(col("pos") > 0L)
  }
}
