package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feature-encoding operators for training-data preparation — the
  * step between the cleaned corpus (Dedup/TextOps/CorpusOps) and the
  * model's input matrix: turn categorical/string columns into numeric
  * features without leaking the target or collecting a vocabulary.
  *
  * Both operators here are vocabulary-free at the EXECUTOR level:
  * leave-one-out encoding broadcasts a category-cardinality summary
  * (never the rows), and the hashing trick needs no vocabulary at
  * all — the two standard answers to "this categorical column has
  * 10^8 levels and the encoder must not be a second training job".
  *
  * Float discipline: targets go through exact integer cents; each
  * emitted double is ONE division of two exactly-computed integers,
  * so results are order-independent and bit-identical to the DuckDB
  * oracle.
  */
object Encode {

  /** Leave-one-out target encoding: each row's categorical value is
    * replaced by the mean target over the OTHER rows of the same
    * category — the standard high-cardinality encoder (public:
    * Micci-Barreca 2001's empirical-Bayes family; LOO is the
    * held-out variant that keeps a row's own target out of its
    * feature, the target-leakage guard). Singleton categories emit
    * null (no other rows to average) rather than a leaked copy of
    * their own target.
    *
    * Shape: one hash aggregate to (category → sum, n) — category
    * cardinality, never row count — broadcast back onto the rows,
    * then the per-row rational (S − c) / (n − 1). At 10^8 categories
    * the summary outgrows a broadcast: drop the [[broadcast]] hint
    * and let AQE pick the shuffle join; the op stays one aggregate +
    * one equi-join either way.
    */
  def looEncode(df: DataFrame, catCol: String, targetCents: Column,
                keep: Seq[String]): DataFrame = {
    val rows = df.select(
      (keep.map(col) :+ col(catCol) :+ targetCents.as("__c")): _*)
    val stats = rows.groupBy(col(catCol))
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("n_cat"))
    rows.join(broadcast(stats), Seq(catCol))
      .select((keep.map(col) :+ col(catCol) :+ col("n_cat") :+
        when(col("n_cat") > 1L,
          (col("__s") - col("__c")).cast(DoubleType) /
            (col("n_cat") - 1L).cast(DoubleType))
          .as("loo_cents")): _*)
  }

  /** The hashing trick (public: Weinberger et al. 2009; the
    * fastText / Vowpal Wabbit featurizer): each feature string is
    * hashed into one of `nBuckets` slots with a ±1 sign drawn from a
    * second hash bit, and a key's feature vector is the signed count
    * per slot — no vocabulary, no fit step, collisions cancel in
    * expectation because of the sign. Output is the sparse COO form
    * (key, bucket, weight), the shape a trainer's sparse matrix
    * loader ingests.
    *
    * Determinism: the slot and sign come from the same 31-fold
    * polynomial hash mod 1e9+7 the dataset fingerprint uses
    * ([[TextOps.polyHash]]), replayable in ANSI SQL — bucket
    * = h mod nBuckets, sign = 1 − 2·((h div nBuckets) mod 2), so the
    * sign bit is independent of the slot bits. Pure map + one hash
    * aggregate on (key, bucket); nothing here is per-vocabulary
    * state.
    */
  def hashFeatures(df: DataFrame, keyCol: String,
                   features: Seq[Column], nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val feat = df.select(col(keyCol),
      explode(array(features: _*)).as("__f"))
    feat
      .select(col(keyCol),
        TextOps.polyHash(col("__f")).as("__h"))
      .select(col(keyCol), (col("__h") % nBuckets).as("bucket"),
        // `div` (integer), not `/` (double): h >= 0 so div == floor
        (lit(1L) - expr(s"(__h div ${nBuckets}L) % 2L") * 2L)
          .as("__sign"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(sum(col("__sign")).as("weight"))
  }
}
