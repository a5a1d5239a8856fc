package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.TextOps

/** RademacherProject: the weight of coordinate (j,i) really is the
  * parity of the polyHash fold the oracle replays (cross-checked
  * through the registered SQL function, not a re-implementation),
  * projection is linear in its input, and deterministic.
  */
class RpSpec extends SparkSuite {
  import spark.implicits._

  test("basis vectors recover the hash-parity weight matrix") {
    val outDim = 4
    val inDim = 6
    // expected sign via the registered polyHash function itself
    val expected = spark.range(0, outDim).toDF("j")
      .crossJoin(spark.range(0, inDim).toDF("i"))
      .select(col("j"), col("i"), TextOps.polyHash(
        concat(lit("rp:"), col("j").cast("string"), lit(":"),
          col("i").cast("string"))).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.getLong(2) % 2 == 0) 1L else -1L))
      .map { case (j, i, w) => (j, i) -> w }.toMap
    // project each basis vector e_i: out(j) must equal w(j,i)
    val basis = (0 until inDim).map(i =>
      (i.toLong, Seq.tabulate(inDim)(d => if (d == i) 1L else 0L)))
      .toDF("i", "v")
    val got = basis.select(col("i"),
        posexplode(GraftFunctions.rademacherProject(col("v"),
          outDim, inDim)).as(Seq("j", "out")))
      .collect()
      .map(r => (r.getInt(1).toLong, r.getLong(0)) -> r.getLong(2)).toMap
    assert(got.size == outDim * inDim)
    got.foreach { case ((j, i), w) =>
      assert(w == expected((j, i)), s"weight mismatch at ($j,$i)")
    }
  }

  test("projection is linear and deterministic") {
    val inDim = 8
    val outDim = 3
    val rnd = new scala.util.Random(3)
    val v1 = Seq.fill(inDim)(rnd.nextInt(2000).toLong - 1000)
    val v2 = Seq.fill(inDim)(rnd.nextInt(2000).toLong - 1000)
    val sum = v1.zip(v2).map { case (a, b) => a + b }
    val df = Seq(("v1", v1), ("v2", v2), ("sum", sum)).toDF("name", "v")
    def proj(name: String): Seq[Long] = {
      val m = df.filter(col("name") === name)
        .select(GraftFunctions.rademacherProject(col("v"), outDim, inDim))
        .head().getSeq[Long](0)
      m.toSeq
    }
    val p1 = proj("v1"); val p2 = proj("v2"); val ps = proj("sum")
    assert(ps == p1.zip(p2).map { case (a, b) => a + b },
      "projection not linear")
    assert(proj("v1") == p1, "projection not deterministic")
  }
}
