package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantics checks for the round-11 additions: the asymmetric
  * containment detector, the census-offset gain table, RFM binning,
  * the nearest as-of, Mann-Kendall, and the trimmed mean.
  */
class RobustStatsSpec extends SparkSuite {

  test("containmentPairs finds an embedded doc that jaccard misses") {
    val s = spark
    import s.implicits._
    val small = "alpha beta gamma delta epsilon zeta"
    // big = small embedded in 10x unrelated filler -> containment 1.0
    // for the small side, jaccard far below any usual threshold
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, s"$filler $small"),
      (3L, "totally unrelated words here nothing shared at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.8, dfCap = 64).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("containment") == 1.0)
    // the symmetric jaccard on the same pair is low — the reason this
    // operator exists
    val jac = Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.5).collect()
    assert(jac.isEmpty)
  }

  test("cumulativeGain equals the global-sort rank definition") {
    val s = spark
    import s.implicits._
    // scores with heavy ties so the census-offset path is exercised
    val rows = (1L to 100L).map(i => (i, (i % 7).toLong, i % 3 == 0))
    val df = rows.toDF("id", "score", "pos")
    val got = Eval.cumulativeGain(df, "id", col("score"), col("pos"))
      .orderBy("decile").collect()
    // reference: explicit global sort
    val ranked = rows.sortBy { case (id, sc, _) => (-sc, id) }
      .zipWithIndex
    val n = rows.size
    val ref = ranked.groupBy { case (_, idx) => idx.toLong * 10L / n }
      .view.mapValues(g => (g.size.toLong,
        g.count { case ((_, _, p), _) => p }.toLong))
      .toMap
    got.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(r.getAs[Long]("n_rows") == ref(d)._1)
      assert(r.getAs[Long]("n_pos") == ref(d)._2)
    }
    assert(got.map(_.getAs[Long]("n_pos")).sum ==
      rows.count(_._3).toLong)
  }

  test("rfmSegments bins partition the user set and keep total cents") {
    val s = spark
    val ev = graft.engine.Tables.events(s, "/root/testdata/sf0.001")
    val seg = Relational.rfmSegments(ev, refEpochSec = 1706659200L)
      .collect()
    val users = ev.select("user_id").distinct().count()
    assert(seg.map(_.getAs[Long]("n_users")).sum == users)
    seg.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 1L && v <= 5L, s"$c=$v out of range")
      }
    }
  }

  test("asofJoinNearest picks the strictly closer side, tie -> backward") {
    val s = spark
    import s.implicits._
    val build = Seq(
      (1L, 10L, 100L), // 10us before probe(110)
      (1L, 11L, 115L), // 5us after probe -> closer, forward wins
      (2L, 20L, 90L), // 10us before probe(100)
      (2L, 21L, 110L) // 10us after -> tie, backward wins
    ).toDF("user_id", "click_id", "us")
      .select(col("user_id"), col("click_id"),
        timestamp_micros(col("us")).as("click_ts"))
    val probe = Seq((1L, 500L, 110L), (2L, 501L, 100L), (3L, 502L, 100L))
      .toDF("user_id", "purchase_id", "us")
      .select(col("user_id"), col("purchase_id"),
        timestamp_micros(col("us")).as("purchase_ts"))
    val got = AsOf.asofJoinNearest(build, probe, "user_id",
      "click_ts", "purchase_ts", "click_id", "purchase_id")
      .collect().map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.getAs[java.lang.Long]("click_id")),
          Option(r.getAs[String]("direction")),
          Option(r.getAs[java.lang.Long]("delta_us")))).toMap
    assert(got(500L) == ((Some(11L), Some("forward"), Some(5L))))
    assert(got(501L) == ((Some(20L), Some("backward"), Some(10L))))
    assert(got(502L) == ((None, None, None)))
  }

  test("mannKendall calls a strictly increasing series increasing") {
    val s = spark
    import s.implicits._
    // one event per day, value strictly rising -> S = n(n-1)/2 = 190
    val ev = (0 until 20).map { i =>
      (i.toLong, 86400000000L * i + 7L, 10.0 + i)
    }.toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    val r = TimeSeries.mannKendall(ev).collect().head
    assert(r.getAs[Long]("s_stat") == 190L)
    assert(r.getAs[String]("trend") == "increasing")
  }

  test("trimmedMean drops exactly n div 10 from each side") {
    val s = spark
    import s.implicits._
    // one group, values 1..100 cents: trim 10 each side -> mean of
    // 11..90 = 50.5
    val df = (1 to 100).map(i => ("g", i.toLong, i.toLong))
      .toDF("grp", "cents", "id")
    val r = Relational.trimmedMean(df, "grp", col("cents"), "id")
      .collect().head
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("n_trimmed_each") == 10L)
    assert(r.getAs[Long]("n_kept") == 80L)
    assert(r.getAs[Double]("trimmed_mean_cents") == 50.5)
  }
}
