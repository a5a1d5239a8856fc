package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class EncodeSpec extends SparkSuite {

  test("looEncode: each row sees the mean of the OTHERS; " +
    "singleton categories emit null") {
    val s = spark
    import s.implicits._
    // cat a: cents (10, 20, 60) → LOO: (40, 35, 15); cat b: singleton
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 60L),
      (4L, "b", 99L)).toDF("id", "cat", "c")
    val out = Encode.looEncode(df, "cat", col("c"), Seq("id"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_cat"),
          Option(r.getAs[java.lang.Double]("loo_cents"))))).toMap
    assert(out(1L) == ((3L, Some(40.0))))
    assert(out(2L) == ((3L, Some(35.0))))
    assert(out(3L) == ((3L, Some(15.0))))
    assert(out(4L) == ((1L, None)), "singleton must not leak its own target")
  }

  test("looEncode is partitioning-insensitive (exact rationals)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 500).map(i =>
      (i.toLong, s"c${rnd.nextInt(7)}", rnd.nextInt(10000).toLong))
    val df = rows.toDF("id", "cat", "c")
    val a = Encode.looEncode(df, "cat", col("c"), Seq("id"))
      .collect().map(_.toSeq).toSet
    val b = Encode.looEncode(df.repartition(13), "cat", col("c"),
      Seq("id")).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 500)
  }

  test("hashFeatures matches a scala replay of the polyHash " +
    "slot/sign rule, layout-stable") {
    val s = spark
    import s.implicits._
    val P = 1000000007L
    def ph(str: String): Long =
      str.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % P)
    val rows = Seq((1L, "red", "x"), (1L, "blue", "x"), (2L, "red", "y"),
      (2L, "red", "y"), (3L, "green", "z"))
    val df = rows.toDF("key", "color", "shape")
    val feats = Seq(concat(lit("color="), col("color")),
      concat(lit("shape="), col("shape")))
    val nb = 16
    val want = rows
      .flatMap { case (k, c, sh) => Seq(k -> s"color=$c", k -> s"shape=$sh") }
      .map { case (k, f) =>
        val h = ph(f)
        (k, h % nb) -> (1L - ((h / nb) % 2L) * 2L)
      }
      .groupBy(_._1).map { case (kb, vs) => kb -> vs.map(_._2).sum }
    val got = Encode.hashFeatures(df, "key", feats, nb).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("weight")).toMap
    assert(got == want)
    val again = Encode.hashFeatures(df.repartition(5), "key", feats, nb)
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("weight")).toMap
    assert(again == got)
  }

  test("hashFeatures: buckets stay inside [0, nBuckets), weights " +
    "bounded by feature count") {
    val s = spark
    import s.implicits._
    val rows = (0 until 300).map(i => (i.toLong % 11, s"v${i % 40}"))
    val df = rows.toDF("key", "v")
    val out = Encode.hashFeatures(df, "key",
      Seq(concat(lit("f="), col("v"))), 8).collect()
    assert(out.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0L && b < 8L
    })
    val totalAbs = out.map(r => math.abs(r.getAs[Long]("weight"))).sum
    assert(totalAbs <= 300L)
  }
}
