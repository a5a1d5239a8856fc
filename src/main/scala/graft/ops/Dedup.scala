package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N1/N2 — the deduplication family for an LLM-data pipeline: exact,
  * MinHash+LSH, SimHash, n-gram jaccard (AllPairs-style), and
  * embedding-cosine near-dup.
  *
  * Everything is expressed as explode → shuffle-on-candidate-key →
  * verify joins: at 100 TB the candidate-generation step is the only
  * O(n·k) shuffle and verification touches candidate pairs only —
  * never the O(n²) cross product. The brute-force O(n²) form exists
  * only inside the DuckDB oracles at sf0.01.
  */
object Dedup {

  /** N1 — exact dedup: canonical representative (min id) per identical
    * key. A single hash aggregation; streaming twin is
    * `dropDuplicatesWithinWatermark` (covered in tests).
    */
  def exactByKey(df: DataFrame, keyCols: Seq[String],
                 idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Candidate pairs from LSH banding: input (id, bandIdx, bandHash)
    * exploded rows; self-join on the band bucket. The join key
    * (bandIdx, bandHash) is the shuffle key — bucket sizes, not corpus
    * size, bound the pair blow-up.
    */
  private def bandPairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("id_a"), col("band_idx"),
      col("band_hash"))
    val b = bands.select(col(idCol).as("id_b"), col("band_idx"),
      col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** N2 — MinHash + LSH near-dup pairs with exact-jaccard verification.
    *
    * shingle sets → 128 minhashes (affine maps of xxhash64 mod 2^31-1)
    * → 32 bands × 4 rows → band-bucket join → verify exact jaccard ≥
    * threshold on the original shingle sets. Verification makes LSH
    * false positives harmless; band config makes false negatives
    * vanishingly rare for genuinely similar docs (p_miss ≈
    * (1-s⁴)³² < 1e-12 at s=0.96).
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.5,
                   numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val rowsPerBand = numPerms / bands
    val shingled = docs
      .select(col(idCol), TextOps.wordShingles(col(textCol)).as("sh"))
      .filter(size(col("sh")) > 0)
    // one xxhash64 per shingle, then cheap affine permutations
    val hashed = shingled.withColumn("hs",
      transform(col("sh"), s => pmod(xxhash64(s), lit(TextOps.P))))
    val minhashes = (0 until numPerms).map { i =>
      val (a, b) = TextOps.minhashAB(i)
      array_min(transform(col("hs"),
        h => pmod(lit(a) * h + lit(b), lit(TextOps.P)))).as(s"mh$i")
    }
    val sigs = hashed.select((col(idCol) +: col("sh").as("sh") +: minhashes): _*)
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band_idx"),
        hash((bi * rowsPerBand until (bi + 1) * rowsPerBand)
          .map(i => col(s"mh$i")): _*).as("band_hash"))
    }
    val banded = sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("b"))
      .select(col(idCol), col("b.band_idx").as("band_idx"),
        col("b.band_hash").as("band_hash"))
    val cands = bandPairs(banded, idCol)
    verifyJaccard(cands, shingled, idCol, "sh", threshold)
  }

  /** Exact jaccard verification of candidate pairs against the set
    * column; emits (id_a, id_b, jaccard).
    */
  private def verifyJaccard(cands: DataFrame, sets: DataFrame,
                            idCol: String, setCol: String,
                            threshold: Double): DataFrame = {
    val sa = sets.select(col(idCol).as("id_a"), col(setCol).as("set_a"))
    val sb = sets.select(col(idCol).as("id_b"), col(setCol).as("set_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("inter",
        size(array_intersect(col("set_a"), col("set_b"))).cast(LongType))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("set_a")) + size(col("set_b")) - col("inter"))
          .cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("jaccard"))
  }

  /** N2 — exact n-gram-jaccard self-join, AllPairs-style: candidates
    * share at least one gram and pass the length filter
    * (j ≥ t ⇒ t·|A| ≤ |B| ≤ |A|/t), then exact verification. No
    * approximation anywhere — the pruning predicates are implied by the
    * threshold, so the result equals the brute-force O(n²) oracle.
    * The gram-inverted-index join keys the shuffle by gram; the length
    * filter and gram-df cap keep bucket fan-out bounded at scale.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.5, n: Int = 5,
                        maxDf: Int = Int.MaxValue): DataFrame = {
    val grams = docs
      .select(col(idCol), TextOps.charGrams(col(textCol), n).as("g"))
      .filter(size(col("g")) > 0)
    val inv = grams.select(col(idCol), size(col("g")).as("sz"),
      explode(col("g")).as("gram"))
    // Optional df cap: a gram present in nearly every doc provides no
    // selectivity; dropping it from candidate generation is safe only
    // when some other shared gram remains — with threshold t >= 0.5 any
    // similar pair shares many grams, and the oracle margin is checked
    // per-dataset. Default keeps all grams (fully exact).
    val filtered = if (maxDf == Int.MaxValue) inv else {
      val df = inv.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf)
      inv.join(broadcast(df.select("gram")), "gram")
    }
    val a = filtered.select(col(idCol).as("id_a"), col("sz").as("sz_a"),
      col("gram"))
    val b = filtered.select(col(idCol).as("id_b"), col("sz").as("sz_b"),
      col("gram"))
    val cands = a.join(b, "gram")
      .filter(col("id_a") < col("id_b") &&
        col("sz_b") >= col("sz_a") * threshold &&
        col("sz_a") >= col("sz_b") * threshold)
      .select("id_a", "id_b").distinct()
    verifyJaccard(cands, grams, idCol, "g", threshold)
  }

  /** N2 — SimHash near-dup pairs: 64-bit signatures, hamming ≤ maxDist.
    * Banding into (maxDist+1) chunks is exact by pigeonhole: a pair
    * within hamming ≤ d must agree on at least one of d+1 chunks, so
    * the bucket join misses nothing. Default d=3 → 4 × 16-bit chunks.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val sigs = TextOps.simhash(docs, idCol, textCol)
    val chunks = Seq(
      pmod(col("sim_lo"), lit(65536L)).as("c0"),
      pmod(shiftright(col("sim_lo"), 16), lit(65536L)).as("c1"),
      pmod(col("sim_hi"), lit(65536L)).as("c2"),
      pmod(shiftright(col("sim_hi"), 16), lit(65536L)).as("c3"))
    val withChunks = sigs.select(
      (col(idCol) +: col("sim_lo") +: col("sim_hi") +: chunks): _*)
    val banded = withChunks.select(col(idCol),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band_idx"),
          col(s"c$i").as("band_hash"))): _*)).as("b"))
      .select(col(idCol), col("b.band_idx").as("band_idx"),
        col("b.band_hash").as("band_hash"))
    val cands = bandPairs(banded, idCol)
    val sa = withChunks.select(col(idCol).as("id_a"),
      col("sim_lo").as("lo_a"), col("sim_hi").as("hi_a"))
    val sb = withChunks.select(col(idCol).as("id_b"),
      col("sim_lo").as("lo_b"), col("sim_hi").as("hi_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("hamming",
        (bit_count(expr("lo_a ^ lo_b")) + bit_count(expr("hi_a ^ hi_b")))
          .cast(LongType))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("hamming"))
  }

  /** Quantized embedding vector (milli-units as int64): makes every
    * dot product exact integer arithmetic — order-independent and
    * bit-identical across engines (see Similarity).
    */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x * lit(1000.0)).cast(LongType))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Sign bits of a quantized vector projected onto `nBits` fixed
    * pseudo-random ±1 hyperplanes (weight of (bit b, dim i) derived
    * from xxhash64 — deterministic, no RNG state shipped to executors).
    * By the random-hyperplane LSH property, P[bit agrees] =
    * 1 − θ/π for a pair at angle θ.
    */
  def hyperplaneBits(qvec: Column, nBits: Int): Column =
    transform(sequence(lit(0), lit(nBits - 1)), b =>
      when(aggregate(
        zip_with(qvec,
          transform(sequence(lit(0), size(qvec) - 1),
            i => when(pmod(xxhash64(b, i), lit(2L)) === 0, lit(1L))
              .otherwise(lit(-1L))),
          (x, w) => x * w),
        lit(0L), (acc, x) => acc + x) >= 0, lit(1L)).otherwise(lit(0L)))

  /** N2 — embedding-cosine near-dup pairs ≥ threshold: hyperplane-LSH
    * banded candidate generation + exact quantized-cosine verification —
    * the same bucketed shape as minhashPairs, never the O(n²) cross
    * product (the brute-force form lives only in the DuckDB oracle).
    *
    * Miss probability per pair at cosine s: (1 − p^r)^b with
    * p = 1 − arccos(s)/π; defaults r=4, b=96 give < 1e-7 at s=0.4.
    * At petabyte corpus scale raise rowsPerBand (bucket selectivity
    * grows 2^r) and bands together to hold recall while keeping the
    * per-band bucket join sparse; candidates are verified exactly, so
    * false positives only cost compute, never correctness.
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.4,
                     bands: Int = 96, rowsPerBand: Int = 4): DataFrame = {
    val nBits = bands * rowsPerBand
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("q"))
      .withColumn("nn", qdot(col("q"), col("q")))
      .withColumn("bits", hyperplaneBits(col("q"), nBits))
    val banded = q.select(col(idCol),
      explode(transform(sequence(lit(0), lit(bands - 1)), bi =>
        struct(bi.as("band_idx"),
          aggregate(
            slice(col("bits"), bi * lit(rowsPerBand) + 1, lit(rowsPerBand)),
            lit(0L), (acc, x) => acc * 2 + x).as("band_hash")))).as("b"))
      .select(col(idCol), col("b.band_idx").as("band_idx"),
        col("b.band_hash").as("band_hash"))
    val cands = bandPairs(banded, idCol)
    val sa = q.select(col(idCol).as("id_a"), col("q").as("q_a"),
      col("nn").as("nn_a"))
    val sb = q.select(col(idCol).as("id_b"), col("q").as("q_b"),
      col("nn").as("nn_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("cosine", qdot(col("q_a"), col("q_b")).cast(DoubleType) /
        sqrt(col("nn_a").cast(DoubleType) * col("nn_b").cast(DoubleType)))
      .filter(col("cosine") >= threshold)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
        col("cosine"))
  }
}
