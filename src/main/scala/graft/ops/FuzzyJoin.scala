package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edit-distance (fuzzy) self-join over a string column — the
  * typo/variant-spelling unifier of an entity-resolution or corpus
  * normalization pass ("colour"/"color", "acmecorp"/"acme-corp").
  *
  * Algorithm: FastSS deletion neighborhoods (Bocek et al. 2007, public
  * algorithm), the signature-join shape every scale-sane similarity
  * operator here uses (cf. minhash bands in graft.ops.Dedup): each
  * string s emits s itself plus its |s| delete-one-character variants
  * as SIGNATURES; two distinct strings at Levenshtein distance ≤ 1
  * necessarily share a signature (equal → s itself; substitution at i
  * → both delete position i; insert/delete → the shorter string IS a
  * variant of the longer). Candidates come from an equi-join on the
  * signature, then one exact `levenshtein` verify kills the false
  * candidates (distinct strings sharing a signature can be at
  * distance 2, e.g. "ab"/"ba" via "a"... both deletions).
  *
  * Why this survives 100× scale where the obvious plan dies:
  * all-pairs `levenshtein` is O(V²) — at a 1e8-token web-corpus
  * vocabulary that's 1e16 comparisons. Here the work is
  * O(V·L) signature rows (~9 per token) through ONE shuffle on the
  * signature, and bucket width is naturally bounded: a signature of
  * length L is reachable only from its ≤(L+1)·|Σ|+1 one-edit
  * super/equal-strings that actually occur, so no hot-bucket cap is
  * needed (contrast minhash buckets, which do need one). The verify
  * is a codegen'd levenshtein on candidate pairs only.
  */
object FuzzyJoin {

  /** Delete-one-character variants of a string column. Empty input →
    * empty array, guarded explicitly: without the guard the result
    * leaned on sequence(1,0) defaulting to a DESCENDING [1,0] and on
    * substr tolerating non-positive positions — harmless by accident,
    * not by contract. */
  private def delOne(s: Column): Column =
    when(length(s) > 0,
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s)))))
      .otherwise(array().cast("array<string>"))

  /** FastSS theorem: ed(u, v) ≤ k ⟹ the k-deletion neighborhoods of
    * u and v intersect. Depth 1 = s plus its delete-one variants;
    * depth 2 adds delete-two (deletions of deletions), deduped.
    */
  private[graft] def deletionSignatures(tok: String,
                                        maxDist: Int): Column = {
    val d1 = delOne(col(tok))
    val base = concat(array(col(tok)), d1)
    val all =
      if (maxDist >= 2) concat(base, flatten(transform(d1, delOne(_))))
      else base
    array_distinct(all)
  }

  /** All unordered pairs (a < b) of `strings.col(strCol)` within
    * Levenshtein distance `maxDist` (1 or 2; distance 0 = equal
    * strings is the degenerate pair — callers wanting it have
    * `groupBy`). Input must be distinct on strCol; output columns
    * (tok_a, tok_b, dist). Depth-2 neighborhoods are ~L²/2 signatures
    * per string — the standard FastSS cost curve; beyond k=2, banded
    * q-gram methods win.
    */
  def editDistancePairs(strings: DataFrame, strCol: String,
                        maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2, "FastSS here supports k in {1,2}")
    val sig = strings
      .select(col(strCol).as("tok"))
      .select(col("tok"),
        explode(deletionSignatures("tok", maxDist)).as("sig"))
    val a = sig.select(col("tok").as("tok_a"), col("sig"))
    val b = sig.select(col("tok").as("tok_b"), col("sig"))
    a.join(b, Seq("sig"))
      .where(col("tok_a") < col("tok_b"))
      // a pair can meet under several shared signatures (bounded by
      // L+1); collapse before the verify so levenshtein runs once per
      // candidate pair, not once per witness
      .select(col("tok_a"), col("tok_b")).distinct()
      .where(levenshtein(col("tok_a"), col("tok_b")) <= maxDist)
      .select(col("tok_a"), col("tok_b"),
        levenshtein(col("tok_a"), col("tok_b")).cast(LongType).as("dist"))
  }

  /** Record linkage (entity resolution) over a records table: find
    * record pairs whose NAME is within `maxDist` edits, restricted to
    * the same BLOCK, scored by how many auxiliary fields agree — the
    * Fellegi–Sunter blocking+scoring shape with deterministic integer
    * weights (score = (maxDist − dist) + #agreements), the
    * "are these two rows the same entity" pass of any master-data /
    * customer-dedup pipeline.
    *
    * Scale shape: the candidate join is FastSS signatures KEYED BY
    * (block, signature) — blocking is part of the join key, so bucket
    * width is bounded by within-block name-neighborhoods, never the
    * corpus; equal-name pairs (dist 0, which the strict-inequality
    * signature stage excludes) come from one exact equi-join on
    * (block, name). One levenshtein verify per distinct candidate
    * pair; agreement fields join back by record id at candidate
    * volume, not table volume. No all-pairs stage anywhere — the
    * within-block quadratic lives only in the DuckDB oracle.
    *
    * Output: (id_a, id_b, block, dist, n_agree, score) with
    * id_a < id_b regardless of name order.
    */
  def linkRecords(records: DataFrame, idCol: String, nameCol: String,
                  blockCol: String, agreeCols: Seq[String],
                  maxDist: Int = 2): DataFrame = {
    require(maxDist == 1 || maxDist == 2, "FastSS here supports k in {1,2}")
    val base = records.select(
      (col(idCol).as("rid") +: col(nameCol).as("nm") +:
        col(blockCol).as("blk") +: agreeCols.map(col)): _*)
    // 8-byte HASHED signatures off the DeletionHashes codegen kernel
    // (one O(L²)-integer-op loop per name — the compositional
    // transform/substr/concat form is CodegenFallback and was the
    // query's dominant cost): the join key is one long; a hash
    // collision only ADDS a false candidate, which the exact
    // levenshtein verify kills — completeness is untouched. The
    // kernel is cheap enough to evaluate once per self-join side —
    // do NOT checkpoint/cache here: a stats-less materialized frame
    // invites the planner to BROADCAST the signature table (measured:
    // a driver-built 1.6M-entry hashed relation cost more than the
    // whole query). Parallelism floor: a single-row-group input would
    // otherwise serialize the kernel + join on one task.
    val sig = Parallelism.floor(base)
      .select(col("rid"), col("nm"), col("blk"),
        explode(graft.functions.GraftFunctions
          .deletionHashes(col("nm"), maxDist)).as("sig"))
    val fa = sig.select(col("blk"), col("sig"), col("rid").as("rid_a"),
      col("nm").as("nm_a"))
    val fb = sig.select(col("blk"), col("sig"), col("rid").as("rid_b"),
      col("nm").as("nm_b"))
    // rid-ordered pairing catches dist-0 (equal-name) pairs in the
    // SAME signature join — equal names share every signature — so no
    // separate equi-join is needed. Verify BEFORE the distinct — the
    // opposite trade from editDistancePairs: low-entropy name
    // universes (shared prefixes, zero-padded ids, common surnames)
    // make some deletion variants HUB signatures shared by a whole
    // block, and shuffling that candidate multiset through a distinct
    // costs more than running the codegen levenshtein once per
    // witness inside the join stage. Survivors are true pairs ×
    // witness multiplicity — small — and dedupe cheaply.
    val fuzzy = fa.join(fb, Seq("blk", "sig"))
      .where(col("rid_a") < col("rid_b") &&
        levenshtein(col("nm_a"), col("nm_b")) <= maxDist)
      .select(col("blk"), col("rid_a"), col("nm_a"), col("rid_b"),
        col("nm_b")).distinct()
    val aga = base.select(
      (col("rid").as("rid_a") +:
        agreeCols.map(c => col(c).as(s"${c}_a"))): _*)
    val agb = base.select(
      (col("rid").as("rid_b") +:
        agreeCols.map(c => col(c).as(s"${c}_b"))): _*)
    val nAgree = agreeCols
      .map(c => when(col(s"${c}_a") === col(s"${c}_b"), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    fuzzy
      .join(aga, Seq("rid_a")).join(agb, Seq("rid_b"))
      .withColumn("dist",
        levenshtein(col("nm_a"), col("nm_b")).cast(LongType))
      .withColumn("n_agree", nAgree)
      .select(
        col("rid_a").as("id_a"), col("rid_b").as("id_b"),
        col("blk").as("block"), col("dist"), col("n_agree"),
        (lit(maxDist.toLong) - col("dist") + col("n_agree")).as("score"))
  }

  /** The registry form: fuzzy-join the `topK` most frequent tokens of
    * a document corpus against themselves — the vocabulary-variant
    * report a tokenizer-training pass runs. Top-k selection is
    * TakeOrderedAndProject (per-partition partial top-k, no global
    * sort) under the total order (count DESC, token ASC), so the
    * vocabulary — and therefore the output — is deterministic.
    */
  def vocabFuzzyPairs(docs: DataFrame, textCol: String,
                      topK: Int = 400): DataFrame = {
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(topK)
    editDistancePairs(vocab, "tok")
  }

  /** Survivorship (golden-record) merge — the step AFTER
    * [[linkRecords]] in every master-data pipeline: linked pairs
    * become entity clusters (bounded min-label propagation, the
    * Dedup.componentMin machinery), then ONE golden row per cluster
    * under deterministic merge rules:
    *   - `golden_id`   = min member id (the canonical-keep rule)
    *   - `name`        = the most complete (longest) name,
    *                     lexicographically last among equal lengths
    *   - `max_cents`   = max of the numeric column (exact integer)
    *   - `cat_mode`    = most frequent categorical value,
    *                     lexicographically last among ties
    *   - `block`       = min block key (constant within a cluster by
    *                     construction — linkage never crosses blocks;
    *                     min only resolves the degenerate empty case)
    * Singletons flow through as their own golden record — the output
    * IS the deduplicated master table, not just the merged clusters.
    *
    * Scale shape: linkage is the bounded FastSS signature join; the
    * merge is two hash aggregates (members, and a (cluster, cat)
    * census for the mode) joined at cluster cardinality. Every rule is
    * an exact integer/string max — no floats anywhere.
    */
  def goldenRecord(records: DataFrame, idCol: String, nameCol: String,
                   blockCol: String, catCol: String, numCents: Column,
                   maxDist: Int = 2): DataFrame = {
    // the linkage join is the expensive subtree and THREE consumers
    // read it (linked-id census, componentMin's symmetric edge set,
    // and transitively every propagation round) — materialize once
    val pairs = linkRecords(records, idCol, nameCol, blockCol,
      Seq(catCol), maxDist)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = goldenRecordFromPairs(records, pairs, idCol, nameCol,
      blockCol, catCol, numCents)
    pairs.unpersist(blocking = false)
    out
  }

  /** [[goldenRecord]] fed from an ALREADY-LINKED pair frame
    * (`(doc_a, doc_b)` id pairs — e.g. the persisted linkage-pair
    * artifact a master-data pipeline maintains): the merge pass alone,
    * no FastSS re-join. Values are identical to [[goldenRecord]] for
    * pairs = linkRecords(...) — the overload only changes WHERE the
    * pair table comes from.
    */
  def goldenRecordFromPairs(records: DataFrame, pairs: DataFrame,
                            idCol: String, nameCol: String,
                            blockCol: String, catCol: String,
                            numCents: Column): DataFrame = {
    val ids = records.select(col(idCol).cast(LongType).as("id"))
    // componentMin propagates over LINKED ids internally (r14) and
    // attaches singletons as their own component; passing the cheap
    // record-id universe here means the (possibly expensive) pair
    // lineage is evaluated exactly once, into componentMin's cached
    // edge set — the previous caller-side linkedIds.distinct() wrapper
    // re-executed the pair join a second time at attach
    val comps = Dedup.componentMin(ids, pairs)
    val base = records.select(col(idCol).cast(LongType).as("id"),
        col(nameCol).as("nm"), col(blockCol).cast(LongType).as("blk"),
        col(catCol).as("cat"), numCents.as("num"))
      .join(comps, "id")
    val catMode = base.groupBy(col("comp"), col("cat"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("comp"))
      .agg(max(struct(col("cnt"), col("cat"))).getField("cat")
        .as("cat_mode"))
    base.groupBy(col("comp"))
      .agg(min(col("id")).as("golden_id"),
        count(lit(1)).as("n_members"),
        min(col("blk")).as("block"),
        max(struct(length(col("nm")).as("l"), col("nm").as("nm")))
          .getField("nm").as("name"),
        max(col("num")).as("max_cents"))
      .join(catMode, "comp")
      .select(col("golden_id"), col("n_members"), col("block"),
        col("name"), col("max_cents"), col("cat_mode"))
  }
}
