package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N3 — similarity search over an embedding column (Array[Float]).
  *
  * Cosine is computed over milli-quantized int64 vectors (Dedup.quantize)
  * so every dot product is exact integer arithmetic: the score — and
  * therefore the ranking — is bit-identical regardless of partitioning,
  * engine, or summation order. sqrt/division on the exact integers are
  * IEEE-correctly-rounded, hence also deterministic.
  */
object Similarity {

  /** Brute-force top-k cosine: the correctness baseline. Queries are
    * broadcast (small side), the corpus streams once; per-query ranking
    * is a windowed row_number with (score desc, id) tie-break.
    * Cost O(|Q|·N·d) — the right plan whenever |Q| is small; the 100 TB
    * path for large |Q| is lshTopK below.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int = 5): DataFrame = {
    val corpus = emb.select(col(idCol).as("neighbor_id"),
      Dedup.quantize(col(vecCol)).as("q_n"))
      .withColumn("nn_n", Dedup.qdot(col("q_n"), col("q_n")))
    val qs = queries.select(col(idCol).as("query_id"),
      Dedup.quantize(col(vecCol)).as("q_q"))
      .withColumn("nn_q", Dedup.qdot(col("q_q"), col("q_q")))
    val scored = corpus.join(broadcast(qs),
      col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.qdot(col("q_n"), col("q_q")).cast(DoubleType) /
          sqrt(col("nn_n").cast(DoubleType) * col("nn_q").cast(DoubleType)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rnk").cast(LongType).as("rnk"), col("cosine"))
  }

  /** Random-hyperplane LSH top-k: the scale path. Each vector gets an
    * nBits-bit sign signature from fixed pseudo-random hyperplanes
    * (deterministic affine-hash weights, no RNG state); search probes
    * only the query's bucket. Recall < 1 by construction — verified
    * against bruteForceTopK in tests, not the SQL oracle.
    *
    * At 100 TB: signatures are one narrow int column; the bucket join
    * shuffles each corpus row once to its bucket, queries broadcast.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 5, nBits: Int = 8): DataFrame = {
    // signature = the nBits sign bits of projections onto fixed ±1
    // hyperplanes, packed into one long (HyperplaneBands with a single
    // band) — deterministic weights, no RNG state shipped to executors.
    def signature(qvec: org.apache.spark.sql.Column) =
      element_at(
        graft.functions.GraftFunctions.hyperplaneBands(qvec, 1, nBits), 1)
    val corpus = emb.select(col(idCol).as("neighbor_id"),
      Dedup.quantize(col(vecCol)).as("q_n"))
      .withColumn("nn_n", Dedup.qdot(col("q_n"), col("q_n")))
      .withColumn("bucket", signature(col("q_n")))
    val qs = queries.select(col(idCol).as("query_id"),
      Dedup.quantize(col(vecCol)).as("q_q"))
      .withColumn("nn_q", Dedup.qdot(col("q_q"), col("q_q")))
      .withColumn("bucket", signature(col("q_q")))
    val scored = corpus.join(broadcast(qs), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.qdot(col("q_n"), col("q_q")).cast(DoubleType) /
          sqrt(col("nn_n").cast(DoubleType) * col("nn_q").cast(DoubleType)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rnk").cast(LongType).as("rnk"), col("cosine"))
  }
}
