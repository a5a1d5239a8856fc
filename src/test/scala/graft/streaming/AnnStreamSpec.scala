package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables
import graft.functions.TopKAgg
import graft.ops.Similarity

case class QVec(ts: Timestamp, vec_id: Long, embedding: Array[Float])

object AnnStreamSpec {
  implicit val qvEnc: org.apache.spark.sql.Encoder[QVec] =
    org.apache.spark.sql.Encoders.product[QVec]

  /** Sort-based reference for TopKAgg: best score per id, ranked by
    * (-score, id), first k. `.toSeq` BEFORE `.map` — mapping the Map
    * directly would re-key by score and collapse tied ids.
    */
  def modelTopK(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.groupBy(_._2).toSeq
      .map { case (id, hits) => (hits.map(_._1).max, id) }
      .sortBy { case (s, i) => (-s, i) }.take(k)
}

/** Streaming IVF probe: identical rows to the batch
  * `Similarity.ivfProbeIndex` over the same query set, and the
  * bounded-heap aggregate's dedup/tie-break/cap contract.
  */
class AnnStreamSpec extends SparkSuite {
  import AnnStreamSpec.qvEnc

  test("TopKAgg: caps at k, folds duplicate ids, breaks score ties " +
    "by smaller id") {
    val s = spark
    import s.implicits._
    val rows = Seq( // group 1: 4 distinct ids, one duplicated with a
      (1L, 0.9, 10L), (1L, 0.8, 11L), (1L, 0.9, 10L), // worse copy
      (1L, 0.8, 9L), (1L, 0.7, 12L), // tie at 0.8 → id 9 before 11
      (2L, 0.5, 20L)) // group 2: fewer than k hits
      .toDF("g", "score", "id")
    val tk = udaf(new TopKAgg(3))
    val got = rows.groupBy("g").agg(tk(col("score"), col("id")).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("pos"), col("col.id"), col("col.score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(
      (1L, 0, 10L, 0.9), (1L, 1, 9L, 0.8), (1L, 2, 11L, 0.8),
      (2L, 0, 20L, 0.5)), s"got $got")
  }

  test("property: TopKAgg equals sort-based top-k for random inputs " +
    "at random reduce/merge splits") {
    val rng = new scala.util.Random(11)
    for (trial <- 0 until 50) {
      val k = 1 + rng.nextInt(8)
      val agg = new TopKAgg(k)
      val n = rng.nextInt(60)
      // small id/score domains force duplicate ids and score ties
      val xs = Seq.fill(n)((rng.nextInt(5) / 4.0, rng.nextInt(12).toLong))
      // random split into partial buffers, then pairwise merge
      val parts = if (xs.isEmpty) Seq(Seq.empty)
        else xs.grouped(1 + rng.nextInt(xs.length)).toSeq
      val merged = parts
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .reduceLeft(agg.merge)
      val got = agg.finish(merged).map(h => (h.score, h.id)).toSeq
      val want = AnnStreamSpec.modelTopK(xs, k)
      assert(got == want, s"trial $trial k=$k: $got != $want")
    }
  }

  test("property: TopKAgg through the Spark udaf path (shuffle-driven " +
    "reduce/merge) equals sort-based top-k") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    val tk = udaf(new TopKAgg(4))
    for (trial <- 0 until 5) {
      val n = 20 + rng.nextInt(120)
      val xs = Seq.fill(n)((rng.nextInt(5) / 4.0, rng.nextInt(12).toLong))
      val got = xs.toDF("score", "id")
        .repartition(7, (col("id") * 31 + col("score") * 100).cast("int"))
        .agg(tk(col("score"), col("id")).as("t"))
        .select(posexplode(col("t")))
        .select(col("col.score"), col("col.id"))
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      val want = AnnStreamSpec.modelTopK(xs, 4)
      assert(got == want, s"trial $trial: $got != $want")
    }
  }

  test("streaming IVF probe equals the batch probe, across " +
    "micro-batches, on RocksDB")(withRocksDB {
    val s = spark
    val emb = Tables.embeddings(s, "/root/testdata/sf0.001")
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val queriesB = emb.filter(col("vec_id") % 5 === 0 &&
      col("vec_id") < 60)
    val cts = Similarity.trainCentroids(corpus, "vec_id", "embedding", 16)
    val index = Similarity.ivfIndex(corpus, "vec_id", "embedding", cts,
      nAssign = 2).cache()
    val want = Similarity.ivfProbeIndex(cts, index, queriesB, "vec_id",
        "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

    val feed = queriesB.select("vec_id", "embedding").collect()
      .map(r => QVec(new Timestamp(1000L + r.getLong(0)), r.getLong(0),
        r.getSeq[Float](1).toArray))
      .sortBy(_.vec_id)
    val input = MemoryStream[QVec](qvEnc, s)
    val q = AnnStream.ivfProbeStream(cts, index, input.toDF(), "vec_id",
        "embedding", "ts", k = 5, nProbe = 4,
        watermark = "1 second", windowDur = "1 minute")
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ann_ckpt"))
      .start()
    feed.grouped(5).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    // sentinel far past the window end closes it for append emission
    input.addData(QVec(new Timestamp(10_000_000L), 999_999L,
      feed.head.embedding))
    q.processAllAvailable()
    // the static index side must probe the persisted postings per
    // trigger (cacheIndex default), not re-scan the source — at scale
    // an uncached static side is a table scan per micro-batch
    val lastPlan = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan
    assert(lastPlan.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }.nonEmpty, s"expected cached static index scan in trigger plan:\n$lastPlan")
    q.stop()

    val got = s.table("ann_stream")
      .filter(col("query_id") =!= 999_999L)
      .select("query_id", "neighbor_id", "rnk", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want,
      s"stream/batch diverge: only-stream=${got diff want}, " +
        s"only-batch=${want diff got}")
    assert(got.nonEmpty && got.forall(_._2 % 5 != 0),
      "neighbors come only from the indexed corpus")
  })
}
