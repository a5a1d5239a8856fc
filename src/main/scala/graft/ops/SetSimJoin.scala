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
}
