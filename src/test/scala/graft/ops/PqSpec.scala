package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.engine.Tables
import graft.functions.GraftFunctions

/** N3 — product-quantization path: kernel identities on hand-built
  * codebooks, determinism of encoding, and recall of the ADC + exact
  * rerank pipeline against the brute-force ranking.
  */
class PqSpec extends SparkSuite {
  import spark.implicits._

  // two subspaces of 2 dims; codebook 0 centroids: (0,0), (10,10);
  // codebook 1 centroids: (5,0), (0,5), (-5,0)
  private val cbs: Array[Array[Array[Long]]] = Array(
    Array(Array(0L, 0L), Array(10L, 10L)),
    Array(Array(5L, 0L), Array(0L, 5L), Array(-5L, 0L)))

  test("PqEncode maps a centroid concatenation to its own codes") {
    val df = Seq(
      (1L, Seq(0L, 0L, 5L, 0L)),    // codes (0, 0)
      (2L, Seq(10L, 10L, -5L, 0L)), // codes (1, 2)
      (3L, Seq(9L, 9L, 0L, 4L))     // nearest: (1, 1)
    ).toDF("id", "v")
    val got = df.select(col("id"),
        GraftFunctions.pqEncode(col("v"), cbs).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(got(1L) == Seq(0, 0))
    assert(got(2L) == Seq(1, 2))
    assert(got(3L) == Seq(1, 1))
  }

  test("PqEncode ties go to the smaller code index") {
    // (5,5) is L2-equidistant from (0,0) and (10,10) in subspace 0;
    // (0,0) tail is equidistant from (5,0), (0,5), (-5,0) in subspace 1
    val df = Seq((1L, Seq(5L, 5L, 0L, 0L))).toDF("id", "v")
    val got = df.select(GraftFunctions.pqEncode(col("v"), cbs))
      .head().getSeq[Int](0).toSeq
    assert(got == Seq(0, 0))
  }

  test("PqReconNorm and PqAdcDot match the reconstruction arithmetic") {
    val df = Seq((1L, Seq(10L, 10L, -5L, 0L), Seq(1L, 2L, 3L, 4L)))
      .toDF("id", "v", "q")
    val row = df.select(
      GraftFunctions.pqEncode(col("v"), cbs).as("codes"),
      GraftFunctions.pqReconNorm(
        GraftFunctions.pqEncode(col("v"), cbs), cbs).as("nnr"),
      GraftFunctions.pqAdcDot(
        GraftFunctions.pqEncode(col("v"), cbs), col("q"), cbs).as("adc"))
      .head()
    // reconstruction of codes (1, 2) is (10,10,-5,0)
    assert(row.getAs[Long]("nnr") == 100L + 100L + 25L)
    assert(row.getAs[Long]("adc") == 10L * 1 + 10L * 2 + -5L * 3 + 0L)
  }

  test("trainPqCodebooks is deterministic and shapes follow m") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 8, codesPerSub = 16)
    val b = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 8, codesPerSub = 16)
    assert(a.length == 8)
    assert(a.map(_.head.length).sum == 64)
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (u, v) => u.sameElements(v) } })
  }

  test("pqTopK recall@5 >= 0.9 vs brute force on sf0.01") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") < 50)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    // Parameter sweep on this fixture (mostly isotropic noise — the
    // hard case for any quantizer; measured 2026-08, 50 queries):
    //   m=8  cps=32: rf=4 .580  rf=10 .800  rf=20 .944
    //   m=8  cps=64: rf=4 .732  rf=10 .920  rf=20 .984
    //   m=16 cps=32: rf=4 .836  rf=10 .964  rf=20 1.00
    //   m=16 cps=64: rf=4 .964  rf=10 .996  rf=20 1.00
    // Chosen point: m=16/cps=32/rf=10 — 16 one-byte codes per 64-dim
    // vector (16x scan compression) at recall .964.
    val cbsReal = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 16, codesPerSub = 32)
    val pq = pairs(Similarity.pqTopK(cbsReal, emb, queries,
      "vec_id", "embedding", k = 5, rerankFactor = 10))
    val recall = (exact intersect pq).size.toDouble / exact.size
    info(f"PQ recall@5 = $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.9, f"PQ recall $recall%.3f below 0.9")
  }

  test("ivfPqTopK (IVFADC) recall@5 >= 0.9 vs brute force on sf0.01") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") < 50)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val cts = Similarity.trainCentroids(emb, "vec_id", "embedding", 32)
    val cbs = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 16, codesPerSub = 32)
    // Dial sweep (measured 2026-08, 50 queries; composition multiplies
    // the stage losses, so both dials sit above their standalone
    // settings): nProbe=12 rf=10 .896 | 12/20 .912 | 14/10 .920 |
    // 14/20 .944 | 16/10 .936 | 16/20 .964. Chosen: 14/20.
    val got = pairs(Similarity.ivfPqTopK(cts, cbs, emb, queries,
      "vec_id", "embedding", k = 5, nProbe = 14, nAssign = 2,
      rerankFactor = 20))
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"IVFADC recall@5 = $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.9, f"IVFADC recall $recall%.3f below 0.9")
  }

  test("pqTopK output schema and per-query rank contiguity") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 4)
    val cbsReal = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 4, codesPerSub = 8)
    val out = Similarity.pqTopK(cbsReal, emb, queries,
      "vec_id", "embedding", k = 3)
    assert(out.schema.map(f => (f.name, f.dataType)) == Seq(
      ("query_id", LongType), ("neighbor_id", LongType),
      ("rnk", LongType), ("cosine", DoubleType)))
    val ranks = out.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    ranks.foreach { case (q, rs) =>
      assert(rs == (1L to rs.length), s"query $q ranks not contiguous: $rs")
    }
  }
}
