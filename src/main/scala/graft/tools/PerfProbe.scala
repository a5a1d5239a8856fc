package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dev tool: A/B-time alternative plan shapes for the expensive
  * queries before committing to one (the measurements quoted in
  * Dedup scaladocs come from runs like this).
  */
object PerfProbe {
  def time(label: String, n: Int)(f: => Long): Unit = {
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); val c = f
      (System.nanoTime() - t0) / 1e9 -> c
    }
    println(f"PROBE $label%-28s min=${ts.map(_._1).min}%.2fs " +
      f"runs=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional 2nd arg selects one probe section (embpairs | semdedup
    // | langid | ...) so a retune doesn't pay the whole suite
    val section = args.lift(1)
    def in(name: String): Boolean = section.forall(_ == name)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    if (in("embpairs")) {
    // stage-level decomposition: where does embedding_pairs' time go?
    // (banded explode alone / + bucket self-join / full with verify)
    val q0 = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("q"))
    def bandedFor(b: Int, r: Int) =
      q0.select(col("vec_id"), posexplode(
          graft.functions.GraftFunctions.hyperplaneBands(col("q"), b, r)))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_hash")
    for ((r, b) <- Seq((4, 96), (6, 256))) {
      time(s"stage banded r=$r b=$b", 3) { bandedFor(b, r).count() }
      time(s"stage cands  r=$r b=$b", 3) {
        val bd = bandedFor(b, r)
        bd.select(col("vec_id").as("id_a"), col("band_idx"), col("band_hash"))
          .join(bd.select(col("vec_id").as("id_b"), col("band_idx"),
            col("band_hash")), Seq("band_idx", "band_hash"))
          .filter(col("id_a") < col("id_b")).count()
      }
      val n = bandedFor(b, r).groupBy("band_idx", "band_hash")
        .agg(count(lit(1)).as("sz"))
        .agg(sum(expr("sz * (sz - 1) div 2")).cast("long")).head().getLong(0)
      println(s"CANDS r=$r b=$b candidateRows=$n")
    }
    time("embedding_pairs/self-join", 3) {
      Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4).count()
    }
    time("embedding_pairs/grouped", 3) {
      Dedup.embeddingPairsGrouped(emb, "vec_id", "embedding", 0.4).count()
    }
    // band-parameter sweep, all within the <1e-7 miss budget at s=0.4
    // (p=0.6312): (4,96)→6e-8, (3,64)→9e-9, (3,56)→9e-8, (5,160)→5e-8,
    // (6,256)→6e-8, (7,400)→1e-7. The random-pair (cosine≈0) candidate
    // mass scales with b/2^r — 6.0, 5.0, 4.0, 3.1 for r=4..7 — so
    // higher r prunes candidates at the cost of more posting rows.
    for ((r, b) <- Seq((3, 56), (3, 64), (4, 96), (5, 160), (6, 256),
        (7, 400)))
      time(s"embedding_pairs r=$r b=$b", 3) {
        Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4,
          bands = b, rowsPerBand = r).count()
      }
    }
    if (in("ngram")) {
    // stage decomposition for neardup_ngram: gram kernel alone, +
    // minhash bands, band-bucket candidate volume, full with verify
    val docs0 = graft.engine.Tables.documents(spark, sfDir)
    val sets = docs0.filter(length(col("text")) >= 5).repartition(32)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.hashedCharGrams(col("text"), 5)
          .as("g"))
    time("ngram/grams", 3) {
      sets.select(sum(size(col("g")))).head(); 0L }
    val banded = sets.select(col("doc_id"), posexplode(
        graft.functions.GraftFunctions.minhashBands(col("g"), 128, 32)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    time("ngram/bands", 3) { banded.count() }
    val cands = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("sz"))
      .agg(sum(expr("sz * (sz - 1) div 2")).cast("long"))
    time("ngram/candidateRows", 1) { cands.head().getLong(0) }
    time("ngram/full", 3) {
      Dedup.ngramJaccardPairs(docs0, "doc_id", "text").count() }
    }
    if (in("fanout")) {
    // Single-row-group parquet arrives as ONE scan partition, so all
    // pre-shuffle map work (shingling, minhash, quantize) runs in one
    // task. A/B each heavy op against a round-robin fan-out of its
    // input to decide where an input-parallelism guard pays.
    val docs0 = graft.engine.Tables.documents(spark, sfDir)
    val docsR = docs0.repartition(32)
    val embR = emb.repartition(32)
    def ab(label: String)(f: DataFrame => DataFrame,
                          base: DataFrame, fanned: DataFrame): Unit = {
      time(s"$label/as-is", 3) { f(base).count() }
      time(s"$label/fanout", 3) { f(fanned).count() }
    }
    ab("neardup_minhash")(d => Dedup.minhashPairs(d, "doc_id", "text"),
      docs0, docsR)
    ab("neardup_ngram")(d => Dedup.ngramJaccardPairs(d, "doc_id",
      "text", threshold = 0.5, n = 5), docs0, docsR)
    ab("simhash_pairs")(d => Dedup.simhashPairs(d, "doc_id", "text",
      maxDist = 3), docs0, docsR)
    ab("dedup_corpus")(d => Dedup.dedupCorpus(d, "doc_id", "text",
      threshold = 0.5), docs0, docsR)
    ab("decontaminate_bloom")(d =>
      graft.ops.CorpusOps.decontaminateBloom(d, "doc_id", "text"),
      docs0, docsR)
    val _ = embR
    }
    if (in("pushdown")) {
    // does a ts-range predicate reach the parquet scan through the
    // NTZ->TimestampType normalization cast in Tables.events?
    val ev = graft.engine.Tables.events(spark, sfDir)
    val bounded = ev.filter(col("ts") >= lit("2026-01-01 10:00:00")
      .cast("timestamp") && col("ts") < lit("2026-01-01 11:00:00")
      .cast("timestamp"))
    val plan = bounded.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse("<no scan line>")
    println(s"PUSHDOWN events.ts: $scan")
    println(s"PUSHDOWN has-range: ${
      scan.contains("GreaterThanOrEqual(ts") || scan.contains("LessThan(ts")}")
    }
    if (in("semdedup"))
    // semantic_dedup nCentroids dial: pair cost is Σ|cell|² (fewer,
    // larger cells → more pairs). sf0.1 measured (min of 3):
    // k=8→0.23s, k=32→0.22s, k=128→0.27s — flat, because 2000 vectors
    // are candidate-cheap at any k; the dial matters at corpus scale,
    // where k is sized to the target E|cell| (SemDeDup practice
    // ~10³-10⁴) so no cell's pair unfold dominates a task
    for (k <- Seq(8, 32, 128))
      time(s"semantic_dedup k=$k", 3) {
        val cts = graft.ops.Similarity.trainCentroids(
          emb, "vec_id", "embedding", k)
        graft.ops.Similarity.semanticDedup(
          emb, "vec_id", "embedding", cts, tau = 0.3).count()
      }
    if (in("langid")) {
    // langid: fused codegen kernel vs the greatest/when tree over four
    // interpreted higher-order filters (each embedding re-tokenizes)
    val docs = graft.engine.Tables.documents(spark, sfDir)
    def langIdUnfused(text: org.apache.spark.sql.Column) = {
      val w = split(lower(text), " ")
      val counts = graft.ops.TextOps.langMarkers.map { case (lang, ms) =>
        lang -> size(filter(w, t => ms.map(m => t === lit(m)).reduce(_ || _)))
      }
      val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
      counts.foldRight(lit("unknown"): org.apache.spark.sql.Column) {
        case ((lang, c), acc) =>
          when(c > 0 && c === best, lit(lang)).otherwise(acc)
      }
    }
    time("langid_confusion/unfused", 3) {
      docs.select(col("lang"), langIdUnfused(col("text")).as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1))).count()
    }
    time("langid_confusion/fused", 3) {
      docs.select(col("lang"),
          graft.ops.TextOps.langId(col("text")).as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1))).count()
    }
    }
    spark.stop()
  }
}
