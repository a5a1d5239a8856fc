package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Properties the layout oracle rows can't isolate: that the curve
  * keys are genuine space-filling curves (bijections with the right
  * adjacency structure), not merely self-consistent with their SQL
  * twins (which unroll the same arithmetic).
  */
class LayoutSpec extends SparkSuite {

  private def grid(n: Int) = {
    val s = spark
    import s.implicits._
    (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
  }

  test("mortonKey is a bijection onto [0, 4^bits)") {
    val keys = grid(16)
      .select(Layout.mortonKey(col("x"), col("y"), 4).as("z"))
      .collect().map(_.getLong(0)).sorted
    assert(keys.toSeq == (0L until 256L))
  }

  test("hilbertKey is a bijection and consecutive indices are " +
      "grid-adjacent (the locality Morton lacks)") {
    val rows = grid(16)
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), 4).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    assert(rows.map(_._1).sorted.toSeq == (0L until 256L))
    val byIdx = rows.sortBy(_._1).map(_._2)
    byIdx.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step at ($x1,$y1)->($x2,$y2)")
    }
    // Morton, by contrast, jumps at every power-of-two seam — count
    // its non-adjacent steps to pin the property that motivates
    // Hilbert (any positive count proves the locality gap is real)
    val mort = grid(16)
      .select(col("x"), col("y"),
        Layout.mortonKey(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1).map(_._2)
    val mortonJumps = mort.sliding(2).count {
      case Array((x1, y1), (x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0)
  }
}
