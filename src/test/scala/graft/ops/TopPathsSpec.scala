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
}
