package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Similarity
import graft.streaming.AnnStream

case class VecDelta(ts: Timestamp, op: String, vec_id: Long,
                    embedding: Array[Float])

object AnnIndexStoreSpec {
  implicit val deltaEnc: org.apache.spark.sql.Encoder[VecDelta] =
    org.apache.spark.sql.Encoders.product[VecDelta]
}

/** The persisted ANN posting store: append/tombstone changelog with
  * latest-wins reads, compaction, and the streaming maintenance twin —
  * after any sequence of deltas the store reads back row-equivalent to
  * a from-scratch `ivfIndex` over the corpus those deltas imply.
  */
class AnnIndexStoreSpec extends SparkSuite {
  import AnnIndexStoreSpec.deltaEnc

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[(Long, Int, Seq[Long], Long)] =
    df.select("vec_id", "cell", "q", "nn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2), r.getLong(3)))
      .toSet

  test("append/tombstone/re-add resolve latest-wins and equal a " +
    "rebuild; compaction preserves the view") {
    val s = spark
    val e = graft.engine.Tables.embeddings(s, dir)
    val corpus0 = e.filter(col("vec_id") % 7 =!= 0)
    val adds = e.filter(col("vec_id") % 7 === 0)
    val dels = e.filter(col("vec_id") % 11 === 0) // some overlap adds
    val cts = Similarity.trainCentroids(corpus0, "vec_id", "embedding", 16)
    val store = tmpDir("ann_store")
    AnnIndexStore.append(corpus0, "vec_id", "embedding", cts, store, 0L)
    AnnIndexStore.tombstone(dels, "vec_id", store, 1L)
    AnnIndexStore.append(adds, "vec_id", "embedding", cts, store, 2L)
    // final corpus: corpus0 minus dels, plus ALL adds (seq2 beats the
    // seq1 tombstone — a re-added id resurrects)
    val finalCorpus = e.filter(
      (col("vec_id") % 7 =!= 0 && col("vec_id") % 11 =!= 0) ||
        col("vec_id") % 7 === 0)
    val want = rows(Similarity.ivfIndex(finalCorpus, "vec_id",
      "embedding", cts, nAssign = 2))
    assert(rows(AnnIndexStore.read(s, store)) == want)

    AnnIndexStore.compact(s, store, compactSeq = 3L)
    assert(rows(AnnIndexStore.read(s, store)) == want,
      "compaction must not change the view")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(store), s.sparkContext.hadoopConfiguration)
    val seqDirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$store/postings")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("seq="))
    assert(seqDirs == Seq("seq=3"), s"got $seqDirs")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/tombstones")))
    // maintenance continues against the compacted generation
    val late = e.filter(col("vec_id") % 13 === 0)
    AnnIndexStore.tombstone(late, "vec_id", store, 4L)
    val want2 = rows(Similarity.ivfIndex(
      finalCorpus.filter(col("vec_id") % 13 =!= 0), "vec_id",
      "embedding", cts, nAssign = 2))
    assert(rows(AnnIndexStore.read(s, store)) == want2)
  }

  test("streaming maintenance folds add/del micro-batches into the " +
    "store and survives a checkpoint restart") {
    val s = spark
    val e = graft.engine.Tables.embeddings(s, dir)
    val cts = Similarity.trainCentroids(e, "vec_id", "embedding", 16)
    val store = tmpDir("ann_store_stream")
    val ckpt = tmpDir("ann_store_ckpt")
    val all = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def delta(op: String, id: Long, emb: Array[Float]) =
      VecDelta(new Timestamp(1000L + id), op, id, emb)

    val input = MemoryStream[VecDelta](deltaEnc, s)
    def start() = AnnStream.indexMaintainStream(input.toDF(), store,
      cts, "vec_id", "embedding", "op", ckpt)
    val q1 = start()
    // batch 0: add the first 30 vectors; batch 1: delete every 3rd,
    // re-add one deleted id in the same LATER batch (resurrects)
    val first = all.take(30)
    input.addData(first.map { case (id, v) => delta("add", id, v) }.toSeq)
    q1.processAllAvailable()
    val killed = first.filter(_._1 % 3 == 0)
    input.addData(killed.map { case (id, v) => delta("del", id, v) }.toSeq)
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint; feed the resurrection batch
    val q2 = start()
    val back = killed.head
    input.addData(Seq(delta("add", back._1, back._2)))
    q2.processAllAvailable()
    q2.stop()

    val surviving = first.filter(p => p._1 % 3 != 0 || p._1 == back._1)
      .map(_._1).toSet
    val got = AnnIndexStore.read(s, store)
    val gotIds = got.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == surviving,
      s"only-got=${gotIds diff surviving} missing=${surviving diff gotIds}")
    val want = rows(Similarity.ivfIndex(
      e.filter(col("vec_id").isin(surviving.toSeq: _*)), "vec_id",
      "embedding", cts, nAssign = 2))
    assert(rows(got) == want)
  }
}
