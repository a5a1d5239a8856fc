package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.QSketchImpl

/** Sketch semantics the oracle row can't isolate: the bucket/lower
  * bound invariants, merge-by-addition associativity, and the
  * conservative quantile guarantee.
  */
class QuantileSketchSpec extends SparkSuite {

  test("bucket/lower invariants: lb <= c < 1.25*lb + 1, monotone, " +
      "round-trip at bucket starts") {
    val rnd = new scala.util.Random(5)
    val cs = (0L to 300L) ++
      Seq.fill(3000)(math.abs(rnd.nextLong()) % (1L << 61))
    cs.foreach { c =>
      val b = QSketchImpl.bucket(c)
      val lb = QSketchImpl.lower(b)
      assert(lb <= c, s"c=$c lb=$lb")
      if (c >= 4L)
        assert(c - lb < math.max(1L, lb / 4L) + lb % 4L + 1L &&
          (c - lb).toDouble / lb.toDouble < 0.25,
          s"c=$c b=$b lb=$lb")
      assert(QSketchImpl.bucket(lb) == b, s"round trip c=$c")
    }
    // monotone over a dense range
    (1L until 5000L).foreach { c =>
      assert(QSketchImpl.bucket(c + 1) >= QSketchImpl.bucket(c))
    }
  }

  test("merge is the same groupBy-sum: sketch(A union B) equals " +
      "sum-merge of sketch(A) and sketch(B); quantiles conservative") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9)
    val a = Seq.fill(500)(("k", math.abs(rnd.nextLong()) % 100000L + 1))
    val b = Seq.fill(500)(("k", math.abs(rnd.nextLong()) % 1000L + 1))
    val skUnion = QuantileSketch.build((a ++ b).toDF("k", "c"),
        Seq("k"), col("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val merged = QuantileSketch.build(a.toDF("k", "c"), Seq("k"),
        col("c"))
      .union(QuantileSketch.build(b.toDF("k", "c"), Seq("k"), col("c")))
      .groupBy(col("k"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(skUnion == merged)
    // quantile guarantee on 1..1000: lb(q) <= exact q < 1.25*lb + eps
    val vals = (1L to 1000L).map(("k", _))
    val q = QuantileSketch.quantiles(
      QuantileSketch.build(vals.toDF("k", "c"), Seq("k"), col("c")),
      Seq("k")).head()
    assert(q.getLong(1) == 1000L)
    val (p50, p90, p99) = (q.getLong(2), q.getLong(3), q.getLong(4))
    assert(p50 <= 500L && 500L < (p50 * 5) / 4 + 4)
    assert(p90 <= 900L && 900L < (p90 * 5) / 4 + 4)
    assert(p99 <= 990L && 990L < (p99 * 5) / 4 + 4)
  }
}
