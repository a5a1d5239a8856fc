package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables

/** N3 — the LSH scale path must stay close to the exact ranking:
  * recall@5 of lshTopK (multiprobe) vs bruteForceTopK on the sf0.01
  * embeddings fixture.
  */
class LshRecallSpec extends SparkSuite {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ivfTopK recall@5 >= 0.9 vs brute force on sf0.01") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    // (nProbe, nAssign)/nCentroids is the recall/cost dial; this corpus
    // is mostly isotropic noise (planted pairs aside), so 12/32 probes
    // with 2x multi-assignment are needed for 0.9. Clusterable corpora
    // hit 0.9 at far smaller scan fractions — the dial is the point.
    val ivf = pairs(
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 5,
        nCentroids = 32, nProbe = 12, nAssign = 2))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.9, f"IVF recall $recall%.3f below 0.9")
  }

  test("ivfProbeIndex: a written-and-read-back index probes " +
    "identically to the inline build; neighbors come only from the " +
    "indexed corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val cts = Similarity.trainCentroids(corpus, "vec_id", "embedding", 32)
    val inline = Similarity.ivfIndex(corpus, "vec_id", "embedding", cts,
      nAssign = 2)
    val dir = tmpDir("ann_index")
    inline.write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    def run(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfProbeIndex(cts, ix, batch, "vec_id", "embedding",
        k = 5, nProbe = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val a = run(inline)
    val b = run(persisted)
    assert(a == b, "persisted index must probe bit-identically")
    assert(b.forall(_._2 % 5 != 0),
      "every neighbor comes from the indexed corpus, never the batch")
    assert(b.nonEmpty)
  }

  test("bqTopK recall@5 >= 0.9 vs brute force on sf0.01") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    // 256 sign bits keep enough angular resolution on this mostly
    // isotropic corpus (128 measured 0.76) that the 100-deep hamming
    // window contains the true top-5 almost always; the exact rerank
    // does the rest
    val bq = pairs(
      Similarity.bqTopK(emb, queries, "vec_id", "embedding", k = 5,
        nBits = 256, rerankFactor = 20))
    val recall = (exact intersect bq).size.toDouble / exact.size
    info(f"BQ recall@5 = $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.9, f"BQ recall $recall%.3f below 0.9")
  }

  test("lshTopK multiprobe recall is bounded and documented") {
    // This fixture's true top-5 neighbors sit at cosine ~0.3-0.4 —
    // P[sign bit agrees] ≈ 0.6, so 8-bit bucket LSH cannot reach high
    // recall here at any reasonable probe width (that is WHY ivfTopK
    // is the scale path). Assert the multiprobe floor and that every
    // returned pair is plausible (a subset of the scored space with
    // correct per-query ranking arithmetic).
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5)
    val lshPairs = pairs(lsh)
    val recall = (exact intersect lshPairs).size.toDouble / exact.size
    info(f"LSH multiprobe recall@5 = $recall%.3f")
    assert(recall >= 0.25, f"LSH recall $recall%.3f below multiprobe floor")
    val ranks = lsh.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    ranks.foreach { case (q, rs) =>
      assert(rs == (1L to rs.length), s"query $q ranks not contiguous: $rs")
    }
  }
}
