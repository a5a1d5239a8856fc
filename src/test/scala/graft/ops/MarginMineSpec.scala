package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Margin-based pair mining must do the one thing raw cosine cannot:
  * demote "hub" candidates that are close to everything. The fixture
  * builds a 2-D corpus where the hub is the raw-cosine argmax for the
  * probe anchor, but its high k-NN neighborhood mean (the penalty)
  * hands the margin argmax to the specific candidate.
  */
class MarginMineSpec extends SparkSuite {

  test("margin demotes the hub that raw cosine selects") {
    val s = spark
    import s.implicits._
    // label 0 = anchors; label 1 = candidates
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f), 0),   // x0 — hub's fan club
      (1L, Array(0.95f, 0.31f), 0),   // x1
      (2L, Array(0.90f, 0.43f), 0),   // x2
      (3L, Array(0.85f, 0.52f), 0),   // x3
      (10L, Array(0.70f, 0.71f), 0),  // xa — the probe anchor
      (100L, Array(0.97f, 0.24f), 1), // hub: close to x0..x3 AND xa
      (101L, Array(0.10f, 0.995f), 1) // specific: close only to xa
    ).toDF("vec_id", "embedding", "label")

    // raw cosine picks the hub for xa...
    val raw = Similarity.bruteForceTopK(
      vecs.filter(col("label") === 1),
      vecs.filter(col("vec_id") === 10L), "vec_id", "embedding", k = 1)
      .collect().head
    assert(raw.getAs[Long]("neighbor_id") == 100L,
      s"fixture broken: raw argmax should be the hub, got $raw")

    // ...margin picks the specific match
    val mined = Similarity.marginMine(vecs, "vec_id", "embedding",
      "label", labelA = 0, labelB = 1, k = 4)
    val byAnchor = mined.collect()
      .map(r => r.getAs[Long]("x_id") -> r).toMap
    assert(byAnchor(10L).getAs[Long]("y_id") == 101L,
      s"margin must demote the hub: ${byAnchor(10L)}")
    // every anchor yields exactly one mined pair
    assert(byAnchor.keySet == Set(0L, 1L, 2L, 3L, 10L))
    // hub-aligned anchors still legitimately match the hub
    assert(byAnchor(0L).getAs[Long]("y_id") == 100L)
    // margins are finite and positive on this fixture
    assert(mined.collect().forall { r =>
      val m = r.getAs[Double]("margin"); m > 0 && !m.isNaN && !m.isInfinite
    })
  }
}
