package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantic properties of the corpus-level pipeline ops that the
  * row-hash oracles can't express directly: decontamination actually
  * removes all train/eval overlap, span stats are internally
  * consistent, repetition stats match hand-computed values on crafted
  * docs, and domain mixing is deterministic and quota-bounded.
  */
class CorpusOpsSpec extends SparkSuite {

  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 0
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "spam spam spam spam spam spam spam spam"),
      (4L, "unique words only appear here nowhere else truly"),
      (5L, "short"))
      .toDF("doc_id", "text")
  }

  test("decontaminate: filtered train set shares no shingle with eval") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = CorpusOps.decontaminate(docs, "doc_id", "text")
    // keep only clean train docs, recompute overlap from scratch
    val clean = docs
      .join(out.filter(!col("contaminated")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(TextOps.wordShingles(col("text"), 3))
        .as("g"))
    val evalGrams = docs
      .filter(TextOps.splitAssign(col("text")) === "test")
      .select(explode(TextOps.wordShingles(col("text"), 3)).as("g"))
      .distinct()
    assert(clean.join(evalGrams, "g").count() === 0L)
    // and the flagged docs each really do overlap
    val flagged = out.filter(col("contaminated"))
    assert(flagged.filter(col("n_contaminated_grams") <= 0).count() === 0L)
  }

  test("mixturePlan: water-filling saturates small sources, levels " +
    "the rest, sums exactly to the target") {
    val s = spark
    import s.implicits._
    // caps: a=2, b=5, c=9, d=9 (one-word tokens); total 25, target 12
    // fill: a saturates (2), remaining 10 over {b,c,d}: level 3 rem 1,
    // extra token to the largest cap by (cap, source) rank -> d
    val docs = (Seq.fill(2)("a") ++ Seq.fill(5)("b") ++ Seq.fill(9)("c")
      ++ Seq.fill(9)("d")).zipWithIndex
      .map { case (src, i) => (i.toLong, src, "w") }
      .toDF("doc_id", "source", "text")
    val got = CorpusOps.mixturePlan(docs, "source", "text", 12L, 25L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "a" -> ((2L, 12L, 2L)), "b" -> ((5L, 12L, 3L)),
      "c" -> ((9L, 12L, 3L)), "d" -> ((9L, 12L, 4L))), s"got $got")
    assert(got.values.map(_._3).sum == 12L, "allocations sum to target")
    // degenerate: target = whole corpus -> everyone saturates
    val full = CorpusOps.mixturePlan(docs, "source", "text", 1L, 1L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(full == Map("a" -> 2L, "b" -> 5L, "c" -> 9L, "d" -> 9L))
  }

  test("spanDedupStats: identical docs fully shared, unique doc zero") {
    val out = CorpusOps.spanDedupStats(fixture, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 0 and 1 are byte-identical → every 5-gram shared
    assert(out(0L)._1 > 0 && out(0L)._1 === out(0L)._2)
    assert(out(1L)._3 === 1.0)
    // docs 2 and 4 share no 5-gram with anything
    assert(out(2L)._2 === 0L && out(2L)._3 === 0.0)
    assert(out(4L)._2 === 0L)
    // doc 5 is below the gram width → zero grams, frac 0 (not NaN)
    assert(out(5L)._1 === 0L && out(5L)._3 === 0.0)
  }

  test("repetitionStats: hand-computed values on crafted docs") {
    val out = CorpusOps.repetitionStats(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 3: 8 × "spam" → 1 distinct token, top bigram 7/7
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_tokens") === 8L)
    assert(d3.getAs[Long]("n_distinct_tokens") === 1L)
    assert(d3.getAs[Double]("dup_token_frac") === 7.0 / 8.0)
    assert(d3.getAs[Long]("n_bigrams") === 7L)
    assert(d3.getAs[Long]("top_bigram_count") === 7L)
    assert(d3.getAs[Double]("top_bigram_frac") === 1.0)
    // doc 4: all distinct → zero dup fraction, every bigram count 1
    val d4 = out(4L)
    assert(d4.getAs[Double]("dup_token_frac") === 0.0)
    assert(d4.getAs[Long]("top_bigram_count") === 1L)
    // doc 5: single token → no bigrams, frac 0 (not NaN)
    val d5 = out(5L)
    assert(d5.getAs[Long]("n_bigrams") === 0L)
    assert(d5.getAs[Double]("top_bigram_frac") === 0.0)
  }

  test("substringDedup: canonical copy kept, within-doc repeats and " +
      "overlapping spans masked once, short docs untouched") {
    import spark.implicits._
    val docs = Seq(
      // shares its 5-gram with doc 2 but OWNS the canonical (lower
      // (doc, pos)) → survives unmodified
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "zz quick brown fox jumps over yy ww vv uu"),
      // within-doc repeat: "a b c d e" at pos 1 and 6 — second
      // occurrence masked
      (3L, "a b c d e a b c d e x"),
      // overlapping duplicated spans union to 7..12, counted once
      (4L, "p q r s t u p q r s t u"),
      (5L, "too short"))
      .toDF("doc_id", "text")
    val out = CorpusOps.substringDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_masked") === 0L)
    assert(out(1L).getAs[String]("clean_text") ===
      "the quick brown fox jumps over the lazy dog end")
    assert(out(2L).getAs[String]("clean_text") === "zz yy ww vv uu")
    assert(out(2L).getAs[Long]("n_masked") === 5L)
    assert(out(3L).getAs[String]("clean_text") === "a b c d e x")
    assert(out(4L).getAs[String]("clean_text") === "p q r s t u")
    assert(out(4L).getAs[Long]("n_masked") === 6L)
    assert(out(5L).getAs[Long]("n_masked") === 0L)
    assert(out(5L).getAs[String]("clean_text") === "too short")
  }

  test("gopherRepetition: paper char-fraction semantics on crafted " +
      "docs — positional union, overlap counted once, tie-breaks") {
    import spark.implicits._
    val docs = Seq(
      // 15×1-char tokens, "a b c d e" repeats at 1/6/11 → dup_5
      // covers everything; top bigram ties at count 3, lexical min
      // "a b" (2 word chars) → frac_top_2 = 6/15
      (0L, "a b c d e a b c d e a b c d e"),
      // all-distinct → dup cov 0 everywhere, ok all true
      (1L, "x y z w v u t s r q"),
      // OVERLAP-ONCE: "m m m m m" at positions 1 and 2 → union of
      // [1..5] and [2..6] is 6 words, not 10
      (2L, "m m m m m m z"),
      // shorter than 4: top_4 and all dup fracs NULL, vacuous ok
      (3L, "a b c"))
      .toDF("doc_id", "text")
    val out = CorpusOps.gopherRepetition(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Long]("n_wchars") === 15L)
    assert(d0.getAs[Double]("frac_top_2") === 6.0 / 15.0)
    assert(!d0.getAs[Boolean]("ok_top_2"))
    assert(d0.getAs[Double]("frac_dup_5") === 1.0)
    assert(d0.getAs[Double]("frac_dup_10") === 1.0)
    assert(!d0.getAs[Boolean]("rep_ok"))
    val d1 = out(1L)
    assert(d1.getAs[Double]("frac_dup_5") === 0.0)
    // every bigram count 1; lexical-min tie-break picks "r q";
    // 2/10 = 0.20 sits exactly AT the threshold → kept (inclusive).
    // (top_3 still fails: one trigram of a 10-word doc is 30% of its
    // chars — the paper applies these gates after the ≥50-word rule)
    assert(d1.getAs[Double]("frac_top_2") === 2.0 / 10.0)
    assert(d1.getAs[Boolean]("ok_top_2"))
    assert(d1.getAs[Boolean]("ok_dup_5") && d1.getAs[Boolean]("ok_dup_10"))
    val d2 = out(2L)
    assert(d2.getAs[Double]("frac_dup_5") === 6.0 / 7.0)
    val d3 = out(3L)
    assert(d3.getAs[Double]("frac_top_2") === 2.0 / 3.0)
    assert(d3.isNullAt(d3.fieldIndex("frac_top_4")))
    assert(d3.isNullAt(d3.fieldIndex("frac_dup_5")))
    assert(d3.getAs[Boolean]("ok_top_4") &&
      d3.getAs[Boolean]("ok_dup_5"))
  }

  test("seqPack: conserves tokens and numbers sequences contiguously") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = TextOps.chunkDocs(docs, "doc_id", "text",
      chunkTokens = 16, overlap = 4)
    val packed = CorpusOps.seqPack(chunks, "doc_id", "chunk_idx",
      "n_chunk_tokens", seqLen = 64, shards = 8)
    val totalChunkTokens = chunks.agg(sum("n_chunk_tokens")).head().getLong(0)
    val totalPackedTokens = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(totalChunkTokens === totalPackedTokens) // nothing dropped
    // per shard: seq ids run 0..max with no gaps (concat-and-split
    // cuts every 64 tokens, and chunks are 16 tokens wide, so every
    // sequence receives at least one chunk end)
    packed.groupBy("shard")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"),
        count(lit(1)).as("n"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("lo") === 0L)
        assert(r.getAs[Long]("n") === r.getAs[Long]("hi") + 1,
          s"gap in seq ids for shard ${r.get(0)}")
      }
  }

  test("contrastivePairs: multi-chunk docs pair anchor 0 with an " +
    "in-range other chunk; single-chunk docs are excluded") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")), // 40 toks -> 3 chunks
      (2L, "just a few tokens"),                      // 1 chunk -> excluded
      (3L, (1 to 17).map(i => s"t$i").mkString(" "))) // 2 chunks
      .toDF("doc_id", "text")
    val out = TextOps.contrastivePairs(docs, "doc_id", "text",
      chunkTokens = 16, overlap = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set(1L, 3L), s"single-chunk doc excluded: $out")
    val (n1, p1, a1, t1) = out(1L)
    assert(n1 == 3L && p1 >= 1L && p1 < n1 && a1 == 16L && t1 >= 1L)
    val (n3, p3, a3, t3) = out(3L)
    // 17 tokens, stride 12: chunk 0 = 16 toks, chunk 1 = toks 13..17
    assert(n3 == 2L && p3 == 1L && a3 == 16L && t3 == 5L)
    // replay-stable: the pick is a pure function of the doc id
    val again = TextOps.contrastivePairs(docs.repartition(7), "doc_id",
      "text", chunkTokens = 16, overlap = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === out.map { case (k, v) => k -> v._2 })
  }

  test("globalIds: dense 1..N, stable across partitionings, ordered") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val out = CorpusOps.globalIds(docs, "doc_id", nShards = 16)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // dense cover of 1..N, no dup ids
    assert(rows.map(_._3).sorted.toSeq === (1L to n))
    assert(rows.map(_._1).distinct.length === rows.length)
    // the id order IS (shard, doc_id): sorting rows one way sorts both
    assert(rows.sortBy(_._3).map(r => (r._2, r._1)).toSeq ===
      rows.map(r => (r._2, r._1)).sortBy(identity).toSeq)
    // stable under a different input partitioning
    val re = CorpusOps.globalIds(docs.repartition(13), "doc_id", 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(re.toSeq === rows.map(r => (r._1, r._3)).sortBy(_._1).toSeq)
  }

  test("domainMix: deterministic, quota-bounded, all sources present") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = CorpusOps.domainMix(docs, "doc_id", "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val b = CorpusOps.domainMix(docs, "doc_id", "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(a.toSeq === b.toSeq) // replay-stable
    assert(a.length === docs.select("source").distinct().count())
    a.foreach { case (src, quota, nDocs, nKept) =>
      assert(quota >= 20 && quota < 80, s"$src quota $quota")
      assert(nKept >= 0 && nKept <= nDocs, s"$src kept $nKept of $nDocs")
    }
  }

  test("prioritySample matches a scala replay; heavy rows dominate; " +
    "layout-stable; zero-weight rows excluded") {
    val s = spark
    import s.implicits._
    def u(id: Long): Long =
      ((id % 2147483648L + id / 2147483648L) % 2147483648L *
        2654435761L) % 4294967296L + 1L
    // 200 light rows (w=1..200) plus one overwhelming row (w=2^40:
    // q >= 2^40/2^32 = 256 > any light row's q <= 200) and one
    // zero-weight row that must never appear
    val rows = (1L to 200L).map(i => (i, i)) ++
      Seq((999L, 1L << 40), (1000L, 0L))
    val df = rows.toDF("doc_id", "w")
    val want = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, w, w.toDouble / u(id).toDouble) }
      .sortBy { case (id, _, q) => (-q, id) }
      .take(50).map(t => (t._1, t._2)).toSet
    val got = CorpusOps.prioritySample(df, "doc_id", col("w"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.contains((999L, 1L << 40)), "heavy row is a near-certain pick")
    assert(!got.exists(_._1 == 1000L), "zero weight never sampled")
    val again = CorpusOps.prioritySample(df.repartition(7), "doc_id",
      col("w"), k = 50).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == got)
    val plan = CorpusOps.prioritySample(df, "doc_id", col("w"), k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
  }

  test("curriculumOrder: pos is a dense 1..N permutation, bucket-" +
    "monotone, with no unpartitioned window in the plan") {
    val s = spark
    import s.implicits._
    val docs = (0L until 97L).map(i => (i, (i % 7) * 10)).toDF("id", "len")
    val out = CorpusOps.curriculumOrder(docs, "id", col("len"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toSeq == (1L to 97L),
      "dense global permutation")
    // bucket never decreases along the position order
    val byPos = rows.sortBy(_._3).map(_._2)
    assert(byPos.zip(byPos.tail).forall { case (a, b) => a <= b },
      "easy buckets come first")
    // the plan must not contain a global-order window
    val unpart = out.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, "no unpartitioned window")
  }

  test("clusterSplit: no near-dup pair straddles a split; counts " +
      "partition the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // the leakage guarantee: every qualifying near-dup pair has both
    // endpoints in the same component, hence the same split bucket
    val cc = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
      .select(col("doc_id"), pmod(col("canonical_id"), lit(10L))
        .as("bucket"))
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.5)
    val straddling = pairs
      .join(cc.select(col("doc_id").as("doc_a"),
        col("bucket").as("ba")), Seq("doc_a"))
      .join(cc.select(col("doc_id").as("doc_b"),
        col("bucket").as("bb")), Seq("doc_b"))
      .where(col("ba") =!= col("bb"))
    assert(straddling.count() === 0L, "near-dup pair crossed a split")
    // and the report partitions the corpus exactly
    val rep = CorpusOps.clusterSplit(docs, "doc_id", "text").collect()
    assert(rep.map(_.getLong(2)).sum === docs.count())
    assert(rep.map(_.getString(0)).toSet.subsetOf(
      Set("train", "val", "test")))
  }

  test("zipfFit: an exact power-law vocabulary fits slope -1 within " +
      "the series tolerance; layout-stable bits") {
    val s = spark
    import s.implicits._
    // term t_r appears round(1024/r) times, r = 1..20: ln f ≈
    // ln 1024 - ln r → slope ≈ -1 (rounding of counts perturbs
    // slightly; well within 0.02)
    val docsDf = (1 to 20).flatMap { r =>
      Seq.fill(math.round(1024.0 / r).toInt)(f"t$r%02d")
    }.grouped(64).map(_.mkString(" ")).toSeq.toDF("text")
    val row = CorpusOps.zipfFit(docsDf, "text", topK = 20).head()
    assert(row.getLong(0) == 20L)
    assert(math.abs(row.getDouble(1) + 1.0) < 0.02, s"slope ${row.getDouble(1)}")
    assert(math.abs(row.getDouble(2) - math.log(1024.0)) < 0.05)
    // bit-stable across partition layouts
    val a = CorpusOps.zipfFit(docsDf.repartition(1), "text", 20).head()
    val b = CorpusOps.zipfFit(docsDf.repartition(7), "text", 20).head()
    assert(a.getDouble(1) == b.getDouble(1) &&
      a.getDouble(2) == b.getDouble(2))
  }
}
