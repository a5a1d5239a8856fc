package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions, SparkSessionExtensionsProvider}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge

/** Column-API wrappers for the graft Catalyst expressions, plus a
  * `SparkSessionExtensions` injector that registers them as SQL
  * functions (`spark.sql.extensions=graft.functions.GraftExtensions`)
  * so `spark.sql("SELECT graft_minhash_bands(...)")` works too.
  */
object GraftFunctions {

  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  /** MinHash band signatures of an array<bigint> of element hashes. */
  def minhashBands(hashes: Column, numPerms: Int, bands: Int): Column =
    c(MinHashBands(e(hashes), numPerms, bands))

  /** Hyperplane-LSH band signatures of a quantized array<bigint> vector. */
  def hyperplaneBands(qvec: Column, bands: Int, rowsPerBand: Int): Column =
    c(HyperplaneBands(e(qvec), bands, rowsPerBand))

  /** Sorted distinct 64-bit hashes of character n-grams. */
  def hashedCharGrams(text: Column, n: Int): Column =
    c(HashedCharGrams(e(text), n))

  /** Sorted distinct 64-bit hashes of k-word shingles. */
  def hashedWordShingles(text: Column, k: Int): Column =
    c(HashedWordShingles(e(text), k))

  /** Hashed FastSS deletion neighborhood of a string (self + all
    * delete-1 [+ delete-2] variant hashes), one O(L²) integer loop. */
  def deletionHashes(s: Column, maxDist: Int): Column =
    c(DeletionHashes(e(s), maxDist))

  /** |A ∩ B| of two sorted distinct array<bigint> columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    c(SortedLongIntersectCount(e(a), e(b)))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    c(QuantizedDot(e(a), e(b)))

  /** Deterministic natural log of a positive BIGINT — a libm-free
    * series (see DetLnImpl) bit-replayed by the oracle at ANY input;
    * Spark's builtin log() (StrictMath), Math.log, and DuckDB ln()
    * all disagree in the last ulp on some integers. */
  def detLn(n: Column): Column = c(DetLn(e(n)))

  /** HdrHistogram-shaped quantile-sketch bucket of a non-negative
    * BIGINT (2 significant bits; oracle-identical integers). */
  def qBucket(v: Column): Column = c(QBucket(e(v)))

  /** Canonical lower bound of a qBucket index. */
  def qLower(b: Column): Column = c(QLower(e(b)))

  /** Distinct k-word-shingle polyHash31-mod-m values, fused
    * (see [[PolyShingleHashes]]). */
  def polyShingleHashes(text: Column, k: Int, m: Long): Column =
    c(PolyShingleHashes(e(text), k, m))

  /** Positional (duplicates kept, document-order) k-word shingles,
    * fused (see [[PositionalShingles]]). */
  def positionalShingles(text: Column, k: Int): Column =
    c(PositionalShingles(e(text), k))

  /** Distinct k-word shingles whose xxhash64 passes `probe`, fused
    * (see [[ShingleSurvivors]]); AcceptAllProbe = all distinct grams. */
  def shingleSurvivors(text: Column, k: Int, probe: LongProbe): Column =
    c(ShingleSurvivors(e(text), k, probe))

  /** Rolling 31-polynomial hash mod m (oracle-identical). */
  def polyHash(s: Column, m: Long): Column =
    c(PolyHash31(e(s), m))

  /** Luhn (mod-10) checksum validity of an all-digit string. */
  def luhnValid(digits: Column): Column = c(LuhnValid(e(digits)))

  /** Simpson-diversity numerator Σ c·(c−1) of code-point counts. */
  def charSimpsonNum(s: Column): Column = c(CharSimpson(e(s)))

  /** The nProbe nearest IVF centroid indices for a quantized vector. */
  def nearestCentroids(qvec: Column, centroids: Array[Array[Long]],
                       nProbe: Int): Column =
    c(NearestCentroids(e(qvec), centroids, nProbe))

  /** PQ codes (one per subspace) of a quantized array<bigint> vector. */
  def pqEncode(qvec: Column, codebooks: Array[Array[Array[Long]]]): Column =
    c(PqEncode(e(qvec), codebooks))

  /** Squared norm of the PQ reconstruction of an array<int> code word. */
  def pqReconNorm(codes: Column,
                  codebooks: Array[Array[Array[Long]]]): Column =
    c(PqReconNorm(e(codes), codebooks))

  /** Asymmetric dot: exact query vector × PQ reconstruction of codes. */
  def pqAdcDot(codes: Column, qvec: Column,
               codebooks: Array[Array[Array[Long]]]): Column =
    c(PqAdcDot(e(codes), e(qvec), codebooks))

  /** Rademacher (±1, deterministic-hash) JL projection to outDim. */
  def rademacherProject(qvec: Column, outDim: Int, inDim: Int): Column =
    c(RademacherProject(e(qvec), outDim, inDim))

  /** Bloom-filter membership probe of a bigint hash column. */
  def bloomMightContain(hash: Column, bloom: GraftBloomFilter): Column =
    c(BloomMightContain(e(hash), bloom))

  /** Always-true, non-pushable evaluation barrier over a bigint hash
    * of a frame's output columns (see [[EvalBarrier]]). */
  def evalBarrier(hash: Column): Column = c(EvalBarrier(e(hash)))

  /** SQ8 encode: per-dimension int8 codes of a quantized vector. */
  def sq8Encode(qvec: Column, maxs: Array[Long]): Column =
    c(Sq8Encode(e(qvec), maxs))

  /** Exact integer dot of two SQ8 code vectors under per-dim scales. */
  def scaledDot(a: Column, b: Column, maxs: Array[Long]): Column =
    c(ScaledDot(e(a), e(b), maxs))

  /** Bucketed byte histogram of a binary payload. */
  def byteHistogram(payload: Column, nBuckets: Int): Column =
    c(ByteHistogram(e(payload), nBuckets))

  /** Real image-header decode of a binary payload:
    * struct<width, height, fmt> from PNG/JPEG/GIF header bytes.
    */
  def imageHeader(payload: Column): Column =
    c(ImageHeaderDecode(e(payload)))

  /** Real RIFF/WAVE header decode of a binary payload:
    * struct<channels, sample_rate, bits, n_samples, fmt>.
    */
  def audioHeader(payload: Column): Column =
    c(AudioHeaderDecode(e(payload)))

  /** Real MP4 box-walk decode of a binary payload:
    * struct<duration_ms, width, height, fmt>.
    */
  def videoHeader(payload: Column): Column =
    c(VideoHeaderDecode(e(payload)))

  /** Misra–Gries heavy-hitter candidate terms (aggregate): at most
    * `capacity` counters per task, mergeable, superset-guaranteed for
    * frequencies > N/(capacity+1).
    */
  def mgCandidates(term: Column, capacity: Int): Column =
    c(MisraGries(e(term), capacity).toAggregateExpression())

  /** Hilbert-curve index of (x, y) over a 2^bits grid — fused codegen
    * kernel (see [[HilbertCurve]] for why this cannot be composed
    * Column arithmetic).
    */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    c(HilbertIndex(e(x), e(y), bits))

  /** Count–min sketch build (aggregate): depth×2^widthLog2 mergeable
    * counter table as array<long>; probe with [[cmsEstimate]].
    */
  def cmsSketch(term: Column, widthLog2: Int, depth: Int): Column =
    c(CmsSketch(e(term), widthLog2, depth).toAggregateExpression())

  /** Point-frequency estimate from a [[cmsSketch]] table (always ≥
    * the true count; ≤ true + 2N/width w.p. ≥ 1−2^−depth).
    */
  def cmsEstimate(sketch: Column, term: Column, widthLog2: Int,
                  depth: Int): Column =
    c(CmsEstimate(e(sketch), e(term), widthLog2, depth))

  /** Fused 64-bit SimHash signature [lo, hi] of a text column. */
  def simhash64(text: Column): Column = c(SimHash64(e(text)))

  /** Fused repetition stats [n_tokens, n_distinct, n_bigrams,
    * top_bigram_count] of a text column.
    */
  def repetitionStats(text: Column): Column = c(RepetitionStats(e(text)))

  /** Fused marker-stopword language-ID vote of a lowercased text
    * column (ties broken by marker order; "unknown" when no marker
    * token occurs).
    */
  def langIdVote(loweredText: Column,
                 markers: Seq[(String, Seq[String])]): Column =
    c(LangIdVote(e(loweredText), markers))

  /** Hashed-linear classifier score: Σ over tokens of
    * weights[polyHash31(token) mod weights.length].
    */
  def linearScore(text: Column, weights: Array[Long]): Column =
    c(HashedLinearScore(e(text), weights))

  /** Fused per-document quality counters [n_chars, n_tokens,
    * n_distinct_tokens, n_stop_tokens, alpha_chars, n_alpha_words].
    */
  def qualityStats(text: Column, stopwords: Seq[String]): Column =
    c(TokenQualityStats(e(text), stopwords))

  /** Fused Gopher repetition-coverage counters: [n_tokens, n_wchars,
    * top2_cov, top3_cov, top4_cov, dup5_cov, …, dup10_cov] — see
    * [[GopherCoverage]].
    */
  def gopherCoverage(text: Column): Column = c(GopherCoverage(e(text)))

  /** Explode an Avro OCF binary blob into rows of the target schema.
    * `permissive` drops undecodable blobs instead of failing the task.
    */
  def avroOcfExplode(bytes: Column,
                     schema: org.apache.spark.sql.types.StructType,
                     permissive: Boolean = false): Column =
    c(AvroOcfExplode(e(bytes), schema, permissive))

  /** Greedy longest-match WordPiece segmentation against a fixed
    * subword vocabulary; single-char fallback for OOV spans.
    */
  def wordPieces(text: Column, vocab: Seq[String]): Column =
    c(WordPieces(e(text), vocab))

  /** BPE apply against an ordered merge table: lowest-rank pair,
    * leftmost occurrence, one merge per step (see BpeEncode).
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    c(BpeEncode(e(text), merges))

  /** Dead-letter decode: rows of (target schema + decode_error) —
    * null error for clean records, one error-carrying all-null row per
    * poison container (see AvroOcfExplodeDlq).
    */
  def avroOcfExplodeDlq(bytes: Column,
                        schema: org.apache.spark.sql.types.StructType)
      : Column =
    c(AvroOcfExplodeDlq(e(bytes), schema))

  private[functions] val registry: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName,
        "graft_minhash_bands"),
      (args: Seq[Expression]) => MinHashBands(args(0),
        intArg(args, 1), intArg(args, 2))),
    (FunctionIdentifier("graft_hyperplane_bands"),
      new ExpressionInfo(classOf[HyperplaneBands].getName,
        "graft_hyperplane_bands"),
      (args: Seq[Expression]) => HyperplaneBands(args(0),
        intArg(args, 1), intArg(args, 2))),
    (FunctionIdentifier("graft_hashed_char_grams"),
      new ExpressionInfo(classOf[HashedCharGrams].getName,
        "graft_hashed_char_grams"),
      (args: Seq[Expression]) => HashedCharGrams(args(0), intArg(args, 1))),
    (FunctionIdentifier("graft_hashed_word_shingles"),
      new ExpressionInfo(classOf[HashedWordShingles].getName,
        "graft_hashed_word_shingles"),
      (args: Seq[Expression]) => HashedWordShingles(args(0), intArg(args, 1))),
    (FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (args: Seq[Expression]) => SortedLongIntersectCount(args(0), args(1))),
    (FunctionIdentifier("graft_qdot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "graft_qdot"),
      (args: Seq[Expression]) => QuantizedDot(args(0), args(1))),
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash31].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => PolyHash31(args(0),
        args(1).eval(null).asInstanceOf[Number].longValue())),
    (FunctionIdentifier("graft_luhn_valid"),
      new ExpressionInfo(classOf[LuhnValid].getName, "graft_luhn_valid"),
      (args: Seq[Expression]) => LuhnValid(args(0))),
    (FunctionIdentifier("graft_char_simpson"),
      new ExpressionInfo(classOf[CharSimpson].getName,
        "graft_char_simpson"),
      (args: Seq[Expression]) => CharSimpson(args(0))),
    (FunctionIdentifier("graft_repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName,
        "graft_repetition_stats"),
      (args: Seq[Expression]) => RepetitionStats(args(0))),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    (FunctionIdentifier("graft_byte_histogram"),
      new ExpressionInfo(classOf[ByteHistogram].getName,
        "graft_byte_histogram"),
      (args: Seq[Expression]) => ByteHistogram(args(0), intArg(args, 1))),
    (FunctionIdentifier("graft_image_header"),
      new ExpressionInfo(classOf[ImageHeaderDecode].getName,
        "graft_image_header"),
      (args: Seq[Expression]) => ImageHeaderDecode(args(0))),
    (FunctionIdentifier("graft_audio_header"),
      new ExpressionInfo(classOf[AudioHeaderDecode].getName,
        "graft_audio_header"),
      (args: Seq[Expression]) => AudioHeaderDecode(args(0))),
    (FunctionIdentifier("graft_video_header"),
      new ExpressionInfo(classOf[VideoHeaderDecode].getName,
        "graft_video_header"),
      (args: Seq[Expression]) => VideoHeaderDecode(args(0))),
    (FunctionIdentifier("graft_mg_candidates"),
      new ExpressionInfo(classOf[MisraGries].getName,
        "graft_mg_candidates"),
      (args: Seq[Expression]) => MisraGries(args(0), intArg(args, 1))),
    (FunctionIdentifier("graft_langid"),
      new ExpressionInfo(classOf[LangIdVote].getName, "graft_langid"),
      (args: Seq[Expression]) =>
        LangIdVote(args(0), graft.ops.TextOps.langMarkers)))

  private def intArg(args: Seq[Expression], i: Int): Int =
    args(i).eval(null).asInstanceOf[Number].intValue()
}

/** `spark.sql.extensions` entry point registering graft SQL functions
  * and the GroupedTopK planner strategy.
  */
class GraftExtensions extends SparkSessionExtensionsProvider {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registry.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RankLimitToGroupedTopK)
  }
}
