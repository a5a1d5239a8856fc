package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

class TopPathsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("paths truncate at 5 steps, sessions split on the gap, ties " +
    "rank by path") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1, one session of 7 events: path truncates to first 5
      (ts("2024-01-01 00:00:00"), 1L, 1L, "a"),
      (ts("2024-01-01 00:01:00"), 1L, 2L, "b"),
      (ts("2024-01-01 00:02:00"), 1L, 3L, "c"),
      (ts("2024-01-01 00:03:00"), 1L, 4L, "d"),
      (ts("2024-01-01 00:04:00"), 1L, 5L, "e"),
      (ts("2024-01-01 00:05:00"), 1L, 6L, "f"),
      (ts("2024-01-01 00:06:00"), 1L, 7L, "g"),
      // same user, NEW session after the 30-min gap: path "a>b"
      (ts("2024-01-01 02:00:00"), 1L, 8L, "a"),
      (ts("2024-01-01 02:01:00"), 1L, 9L, "b"),
      // user 2: also "a>b" → count 2
      (ts("2024-01-01 00:00:00"), 2L, 10L, "a"),
      (ts("2024-01-01 00:01:00"), 2L, 11L, "b"),
      // user 3: "z" alone
      (ts("2024-01-01 00:00:00"), 3L, 12L, "z")
    ).toDF("ts", "user_id", "event_id", "event_type")
    val got = Sessionize.topPaths(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a>b" -> 2L, "a>b>c>d>e" -> 1L, "z" -> 1L))
  }

  test("sessionAssoc: hand-computed support/confidence/lift, " +
    "repeat events inside a session count once") {
    val s = spark
    import s.implicits._
    // sessions: u1s1 {a,b} (a twice — counted once), u1s2 {a},
    // u2s1 {a,b}, u3s1 {b,c}. n=4; n_a=3, n_b=3, n_ab=2 →
    // support .5, conf 2/3 both ways, lift 2*4/9. (b,c): n_ab=1 <
    // minSupport → dropped.
    val ev = Seq(
      (ts("2024-01-01 00:00:00"), 1L, 1L, "a"),
      (ts("2024-01-01 00:01:00"), 1L, 2L, "a"),
      (ts("2024-01-01 00:02:00"), 1L, 3L, "b"),
      (ts("2024-01-01 02:00:00"), 1L, 4L, "a"),
      (ts("2024-01-01 00:00:00"), 2L, 5L, "a"),
      (ts("2024-01-01 00:01:00"), 2L, 6L, "b"),
      (ts("2024-01-01 00:00:00"), 3L, 7L, "b"),
      (ts("2024-01-01 00:01:00"), 3L, 8L, "c")
    ).toDF("ts", "user_id", "event_id", "event_type")
    val out = Sessionize.sessionAssoc(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("type_a") == "a" &&
      r.getAs[String]("type_b") == "b")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_ab") == 2L &&
      r.getAs[Long]("n_sessions") == 4L)
    assert(r.getAs[Double]("support") == 0.5)
    assert(r.getAs[Double]("conf_a_to_b") == 2.0 / 3.0)
    assert(r.getAs[Double]("conf_b_to_a") == 2.0 / 3.0)
    assert(r.getAs[Double]("lift") == 8.0 / 9.0)
  }
}
