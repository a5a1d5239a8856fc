package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** IVF index maintenance: delete-then-upsert under FIXED centroids is
  * row-equivalent to a full rebuild over the final corpus — the
  * invariant that makes daily delta-cost maintenance safe to run for
  * months between retrains.
  */
class AnnMaintenanceSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[(Long, Int, Seq[Long], Long)] =
    df.select("vec_id", "cell", "q", "nn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2), r.getLong(3)))
      .toSet

  test("delete-then-upsert equals a rebuild over the final corpus") {
    val e = graft.engine.Tables.embeddings(spark, dir)
    val corpus0 = e.filter(col("vec_id") % 7 =!= 0)
    val adds = e.filter(col("vec_id") % 7 === 0)
    val dels = e.filter(col("vec_id") % 11 === 0)
    val cts = Similarity.trainCentroids(corpus0, "vec_id", "embedding", 16)
    val maintained = Similarity.ivfIndexUpsert(
      Similarity.ivfIndexDelete(
        Similarity.ivfIndex(corpus0, "vec_id", "embedding", cts,
          nAssign = 2),
        dels, "vec_id"),
      adds, "vec_id", "embedding", cts, nAssign = 2)
    val finalCorpus = e.filter(
      (col("vec_id") % 7 =!= 0 && col("vec_id") % 11 =!= 0) ||
        col("vec_id") % 7 === 0)
    val rebuilt = Similarity.ivfIndex(finalCorpus, "vec_id", "embedding",
      cts, nAssign = 2)
    assert(rows(maintained) == rows(rebuilt))
  }

  test("upsert of an EXISTING id overwrites its postings, not appends") {
    val e = graft.engine.Tables.embeddings(spark, dir)
    val cts = Similarity.trainCentroids(e, "vec_id", "embedding", 16)
    val index = Similarity.ivfIndex(e, "vec_id", "embedding", cts,
      nAssign = 2)
    // re-add id 3 with a DIFFERENT vector (id 5's embedding): its old
    // postings must vanish and the new assignment must match what a
    // fresh build of that vector produces
    val reAdd = e.filter(col("vec_id") === 5)
      .select(lit(3L).as("vec_id"), col("embedding"))
    val upserted = Similarity.ivfIndexUpsert(index, reAdd, "vec_id",
      "embedding", cts, nAssign = 2)
    val got3 = rows(upserted.filter(col("vec_id") === 3))
    val want3 = rows(Similarity.ivfIndex(reAdd, "vec_id", "embedding",
      cts, nAssign = 2))
    assert(got3 == want3)
    assert(upserted.filter(col("vec_id") === 3).count() == 2) // nAssign
    // everything else untouched
    assert(rows(upserted.filter(col("vec_id") =!= 3)) ==
      rows(index.filter(col("vec_id") =!= 3)))
  }

  test("cell stats census sums to the index posting count and flags " +
    "the empty-cell case") {
    val e = graft.engine.Tables.embeddings(spark, dir)
    val cts = Similarity.trainCentroids(e, "vec_id", "embedding", 16)
    val index = Similarity.ivfIndex(e, "vec_id", "embedding", cts,
      nAssign = 2)
    val stats = Similarity.ivfCellStats(index)
    val total = stats.agg(sum(col("n_postings"))).head().getLong(0)
    assert(total == index.count())
    // deleting every vector in one cell leaves that cell absent from
    // the census — the dead-centroid signal
    val victims = index.filter(col("cell") === 0).select("vec_id")
    val after = Similarity.ivfCellStats(
      Similarity.ivfIndexDelete(index, victims, "vec_id"))
    assert(after.filter(col("cell") === 0).count() == 0)
  }
}
