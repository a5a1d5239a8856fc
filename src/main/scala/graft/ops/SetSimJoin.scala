package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions

/** Exact set-similarity self-join with prefix filtering (the All-Pairs
  * / PPJoin family — Bayardo et al., WWW'07; Chaudhuri et al.,
  * ICDE'06) over word-shingle sets: every document pair whose shingle
  * Jaccard is >= tau, with NO false negatives and NO all-pairs stage.
  *
  * This is the EXACT counterpart of the MinHash/SimHash band family in
  * [[Dedup]]: the banded joins are probabilistic (recall-gated), this
  * one is a theorem. Prefix-filter principle: order every set by one
  * GLOBAL token order (rarest document-frequency first, token as the
  * tiebreak) and keep only each set's first n - ceil(tau*n) + 1
  * tokens. If J(A,B) >= tau then |A∩B| >= ceil(tau*max(|A|,|B|)), and
  * the SMALLEST common token under the global order sits within both
  * prefixes (its rank in A is at most |A| - |A∩B| + 1), so an
  * equi-join on prefix tokens finds every qualifying pair. Two more
  * lossless prunes stack on top: the LENGTH filter (J >= tau forces
  * tau*|A| <= |B| and tau*|B| <= |A| — cross-multiplied integers on
  * the candidate join, so mismatched sizes never reach verify), and
  * rarest-first ordering itself — prefix buckets are keyed by the
  * corpus's RARE shingles, so bucket sizes stay small even when the
  * corpus has stopword-like shingles (those sort to the suffixes and
  * never join).
  *
  * Shingles travel as SORTED DISTINCT 64-bit hashes (the
  * HashedWordShingles codegen kernel — the banded-dedup precedent),
  * not strings: candidate-join keys are 8 bytes, and the verify is
  * the codegen SortedLongIntersectCount merge walk instead of a
  * string-array intersect. Shape at 100 TB: one shingle-keyed
  * aggregate for document frequency, a shuffle join back (shingle
  * vocabulary is corpus-scale — never broadcast), a per-doc
  * sort_array for the global order, the prefix equi-join, then
  * verification joins keyed by doc id with an exact integer Jaccard
  * test (inter*den >= num*union) — floats only in the final reported
  * ratio, one division.
  */
object SetSimJoin {

  /** All doc pairs with 3-shingle-set Jaccard >= tauNum/tauDen, exact.
    * Output: doc_a < doc_b, inter, na, nb, jaccard.
    */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
                  tauNum: Int = 6, tauDen: Int = 10): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen)
    val sets = docs
      .select(col(idCol).as("doc"),
        GraftFunctions.hashedWordShingles(col(textCol), 3).as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("doc"), col("ts"), size(col("ts")).as("n"))
    val tok = sets.select(col("doc"), col("n"),
      explode(col("ts")).as("sh"))
    val dfreq = tok.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // global order = (df asc, hash asc); sort_array on the struct
    // sorts lexicographically by field position
    val prefix = tok.join(dfreq, "sh")
      .groupBy(col("doc"), col("n"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh"))))
        .as("ord"))
      // prefix length n - ceil(tau*n) + 1, ceil as exact integer math
      .select(col("doc"), col("n"), explode(expr(
        s"slice(ord, 1, size(ord) - " +
          s"(($tauNum * size(ord) + $tauDen - 1) div $tauDen) + 1)"))
        .as("o"))
      .select(col("doc"), col("n"), col("o.sh").as("sh"))
    val cand = prefix.select(col("doc").as("doc_a"),
        col("n").as("na"), col("sh"))
      .join(prefix.select(col("doc").as("doc_b"),
        col("n").as("nb"), col("sh")), Seq("sh"))
      .where(col("doc_a") < col("doc_b") &&
        col("na") * tauNum <= col("nb") * tauDen &&
        col("nb") * tauNum <= col("na") * tauDen)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("doc").as("doc_a"), col("ts").as("sa"),
        col("n").as("na")), Seq("doc_a"))
      .join(sets.select(col("doc").as("doc_b"), col("ts").as("sb"),
        col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        GraftFunctions.sortedIntersectCount(col("sa"), col("sb"))
          .as("inter"),
        col("na"), col("nb"))
      .where(col("inter") * tauDen >=
        (col("na") + col("nb") - col("inter")) * tauNum)
      .select(col("doc_a"), col("doc_b"),
        col("inter").cast(LongType).as("inter"),
        col("na").cast(LongType).as("na"),
        col("nb").cast(LongType).as("nb"),
        (col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")).cast(DoubleType))
          .as("jaccard"))
  }

  /** The persisted EXACT-incremental artifact (the corpusBandIndex
    * counterpart with a theorem instead of a probability): the corpus
    * document-frequency table (the GLOBAL order every future delta
    * must rank under), each corpus doc's prefix postings, and the
    * corpus shingle sets for verification. In production all three
    * are written once per corpus rebuild and read back; a daily delta
    * probes them without ever re-pairing the corpus.
    */
  case class PrefixIndex(dfreq: DataFrame, postings: DataFrame,
                         sets: DataFrame)

  def prefixIndex(corpus: DataFrame, idCol: String, textCol: String,
                  tauNum: Int = 6, tauDen: Int = 10): PrefixIndex = {
    val sets = corpus
      .select(col(idCol).as("corpus_id"),
        GraftFunctions.hashedWordShingles(col(textCol), 3).as("set_c"))
      .where(size(col("set_c")) > 0)
      .withColumn("n_c", size(col("set_c")))
    val tok = sets.select(col("corpus_id"), col("n_c"),
      explode(col("set_c")).as("sh"))
    val dfreq = tok.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val postings = tok.join(dfreq, "sh")
      .groupBy(col("corpus_id"), col("n_c"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh"))))
        .as("ord"))
      .select(col("corpus_id"), col("n_c"), explode(expr(
        s"slice(ord, 1, size(ord) - " +
          s"(($tauNum * size(ord) + $tauDen - 1) div $tauDen) + 1)"))
        .as("o"))
      .select(col("o.sh").as("sh"), col("corpus_id"), col("n_c"))
    PrefixIndex(dfreq, postings, sets)
  }

  /** Exact delta-vs-corpus similarity join against the persisted
    * prefix index: every (delta doc, corpus doc) pair with Jaccard >=
    * tau — no false negatives, and the corpus is never re-paired.
    * The delta ranks its shingles under the CORPUS global order with
    * df = 0 for unseen shingles (rarest-possible; a shingle shared
    * with any corpus doc has df >= 1 on both sides, so the
    * smallest-common-shingle prefix theorem still binds — unseen
    * shingles only push the delta's prefix cut outward, never drop a
    * common shingle below it). Delta-side frames broadcast (the
    * incrementalDedupWithIndex precedent: the delta is the small
    * side); candidate volume is bounded by the corpus's PREFIX
    * postings, which rarest-first ordering keeps skew-free.
    */
  def probeDelta(delta: DataFrame, index: PrefixIndex, idCol: String,
                 textCol: String, tauNum: Int = 6,
                 tauDen: Int = 10): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen)
    val dSets = delta
      .select(col(idCol).as("delta_id"),
        GraftFunctions.hashedWordShingles(col(textCol), 3).as("set_d"))
      .where(size(col("set_d")) > 0)
      .withColumn("n_d", size(col("set_d")))
    val dPrefix = dSets
      .select(col("delta_id"), col("n_d"), explode(col("set_d")).as("sh"))
      .join(index.dfreq, Seq("sh"), "left")
      .groupBy(col("delta_id"), col("n_d"))
      .agg(sort_array(collect_list(
        struct(coalesce(col("df"), lit(0L)).as("df"), col("sh"))))
        .as("ord"))
      .select(col("delta_id"), col("n_d"), explode(expr(
        s"slice(ord, 1, size(ord) - " +
          s"(($tauNum * size(ord) + $tauDen - 1) div $tauDen) + 1)"))
        .as("o"))
      .select(col("delta_id"), col("n_d"), col("o.sh").as("sh"))
    val cand = index.postings
      .join(broadcast(dPrefix), Seq("sh"))
      .where(col("n_d") * tauNum <= col("n_c") * tauDen &&
        col("n_c") * tauNum <= col("n_d") * tauDen)
      .select(col("delta_id"), col("corpus_id"))
      .distinct()
    cand
      // no broadcast HINT: the delta is small by contract, not by
      // structure — AQE broadcasts the runtime size while it fits
      .join(dSets, Seq("delta_id"))
      .join(index.sets, Seq("corpus_id"))
      .select(col("delta_id"), col("corpus_id"),
        GraftFunctions.sortedIntersectCount(col("set_d"), col("set_c"))
          .as("inter"),
        col("n_d"), col("n_c"))
      .where(col("inter") * tauDen >=
        (col("n_d") + col("n_c") - col("inter")) * tauNum)
      .select(col("delta_id"), col("corpus_id"),
        col("inter").cast(LongType).as("inter"),
        col("n_d").cast(LongType).as("n_d"),
        col("n_c").cast(LongType).as("n_c"),
        (col("inter").cast(DoubleType) /
          (col("n_d") + col("n_c") - col("inter")).cast(DoubleType))
          .as("jaccard"))
  }
}
