package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

class Scd2Spec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scdType2: versions chain, tie closed by seq, last open-ended") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      // key 1: three changes, two at the SAME ts (seq 4 then 5)
      (1L, ts("2024-01-01 00:00:00"), 3L, "a", 100L),
      (1L, ts("2024-01-02 00:00:00"), 4L, "b", 200L),
      (1L, ts("2024-01-02 00:00:00"), 5L, "c", 300L),
      // key 2: single change — immediately current
      (2L, ts("2024-06-01 12:00:00"), 9L, "z", 700L)
    ).toDF("k", "ts", "seq", "attr", "cents")
    val out = Relational.scdType2(changes, "k", "ts", "seq",
        Seq("attr", "cents"))
      .orderBy("k", "version_n").collect()
    assert(out.length == 4)
    val v1 = out(0)
    assert(v1.getAs[String]("attr") == "a")
    assert(v1.getAs[Long]("version_n") == 1L)
    assert(v1.getAs[Timestamp]("valid_to") == ts("2024-01-02 00:00:00"))
    assert(!v1.getAs[Boolean]("is_current"))
    // the tie: seq 4's version is closed by seq 5 at the same instant
    val v2 = out(1)
    assert(v2.getAs[String]("attr") == "b")
    assert(v2.getAs[Timestamp]("valid_from") ==
      v2.getAs[Timestamp]("valid_to"), "zero-length version on ts tie")
    val v3 = out(2)
    assert(v3.getAs[String]("attr") == "c")
    assert(v3.getAs[Timestamp]("valid_to") == null)
    assert(v3.getAs[Boolean]("is_current"))
    val k2 = out(3)
    assert(k2.getAs[Long]("version_n") == 1L &&
      k2.getAs[Boolean]("is_current"))
  }

  test("scdType2 versions partition cleanly: every instant in a key's " +
    "span maps to exactly one version") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val changes = (0 until 200).map { i =>
      (i % 9L, ts(f"2024-01-${1 + rnd.nextInt(28)}%02d " +
        f"${rnd.nextInt(24)}%02d:00:00"), i.toLong, "v", i * 10L)
    }.toDF("k", "ts", "seq", "attr", "cents")
    val vers = Relational.scdType2(changes, "k", "ts", "seq",
      Seq("attr", "cents")).collect()
    vers.groupBy(_.getAs[Long]("k")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("version_n"))
      // consecutive versions abut exactly; exactly one open end
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Timestamp]("valid_to") ==
            b.getAs[Timestamp]("valid_from"))
        case _ =>
      }
      assert(sorted.count(_.getAs[Timestamp]("valid_to") == null) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
    }
  }
}
