package graft.ops

import graft.SparkSuite

/** pcaTopComponent semantics the oracle row can't isolate: exact
  * eigenpair recovery on hand-built Grams, seed handling, and
  * layout-insensitivity of the integer Gram.
  */
class PcaSpec extends SparkSuite {

  test("pcaTopComponent: diagonal Gram keeps the seed axis; rank-one " +
      "Gram converges to the known eigenpair; layout-stable") {
    val s = spark
    import s.implicits._
    // rows (3,0) and (0,1) in milli-units → G = [[9,0],[0,1]]:
    // top eigenpair (9, e0); the e0 seed is already the answer
    val diag = Seq(Array(0.003f, 0.0f), Array(0.0f, 0.001f))
      .toDF("embedding")
    val r0 = Similarity.pcaTopComponent(diag, "embedding")
      .collect().sortBy(_.getLong(0))
    assert(r0.length == 2)
    assert(r0(0).getDouble(1) == 1.0 && r0(1).getDouble(1) == 0.0)
    assert(r0(0).getDouble(2) == 9.0)
    // two identical rows (1,1) → G = [[2,2],[2,2]]: eigenpair
    // (4, (1/√2, 1/√2)); one power round lands exactly
    val ones = Seq(Array(0.001f, 0.001f), Array(0.001f, 0.001f))
      .toDF("embedding")
    val r1 = Similarity.pcaTopComponent(ones, "embedding")
      .collect().sortBy(_.getLong(0))
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(r1(0).getDouble(1) - inv) < 1e-15)
    assert(math.abs(r1(1).getDouble(1) - inv) < 1e-15)
    assert(math.abs(r1(0).getDouble(2) - 4.0) < 1e-12)
    // integer Gram commutes under partitioning: 1 vs 7 partitions
    // bit-identical on a random batch
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(40)(Array.fill(8)(rnd.nextFloat() - 0.5f))
    val a = Similarity.pcaTopComponent(
        vecs.toDF("embedding").repartition(1), "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getDouble(2))).sortBy(_._1).toSeq
    val b = Similarity.pcaTopComponent(
        vecs.toDF("embedding").repartition(7), "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getDouble(2))).sortBy(_._1).toSeq
    assert(a == b)
    // the loadings are unit-norm and the eigenvalue is the Rayleigh
    // quotient of a PSD matrix: positive
    assert(math.abs(a.map(x => x._2 * x._2).sum - 1.0) < 1e-12)
    assert(a.head._3 > 0.0)
  }
}
