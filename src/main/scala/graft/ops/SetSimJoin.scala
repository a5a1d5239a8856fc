package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TextOps.tokens

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
  * equi-join on prefix tokens finds every qualifying pair. Rarest-
  * first ordering is the scale lever: prefix buckets are keyed by the
  * corpus's RARE shingles, so bucket sizes stay small even when the
  * corpus has stopword-like shingles — those sort to the suffixes and
  * never join.
  *
  * Shape at 100 TB: one shingle-keyed aggregate for document
  * frequency, a shuffle join back (shingle vocabulary is corpus-scale
  * — never broadcast), a per-doc sort_array to apply the global
  * order, the prefix equi-join, then verification joins keyed by doc
  * id with an exact integer Jaccard test (inter*den >= num*(union)) —
  * floats only in the final reported ratio, one division.
  */
object SetSimJoin {

  /** Distinct 3-token shingles of a whitespace-token array. Guarded:
    * sequence(1, size-2) on size<3 would produce a DESCENDING range
    * (the delOne lesson), so short docs are filtered out first.
    */
  def shingles3(w: Column): Column = array_distinct(expr(
    "transform(sequence(1, size(w) - 2), " +
      "i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"))

  /** All doc pairs with shingle-set Jaccard >= tauNum/tauDen, exact.
    * Output: doc_a < doc_b, inter, na, nb, jaccard.
    */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
                  tauNum: Int = 6, tauDen: Int = 10): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen)
    val sets = docs
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc"), shingles3(col("w")).as("ts"))
      .select(col("doc"), col("ts"), size(col("ts")).as("n"))
    val tok = sets.select(col("doc"), explode(col("ts")).as("sh"))
    val dfreq = tok.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // global order = (df asc, shingle asc); sort_array on the struct
    // sorts lexicographically by field position
    val prefix = tok.join(dfreq, "sh")
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh"))))
        .as("ord"))
      // prefix length n - ceil(tau*n) + 1, ceil as exact integer math
      .select(col("doc"), explode(expr(
        s"slice(ord, 1, size(ord) - " +
          s"(($tauNum * size(ord) + $tauDen - 1) div $tauDen) + 1)"))
        .as("o"))
      .select(col("doc"), col("o.sh").as("sh"))
    val cand = prefix.select(col("doc").as("doc_a"), col("sh"))
      .join(prefix.select(col("doc").as("doc_b"), col("sh")), Seq("sh"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("doc").as("doc_a"), col("ts").as("sa"),
        col("n").as("na")), Seq("doc_a"))
      .join(sets.select(col("doc").as("doc_b"), col("ts").as("sb"),
        col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).as("inter"),
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
