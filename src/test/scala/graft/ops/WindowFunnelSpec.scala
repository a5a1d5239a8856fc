package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

class WindowFunnelSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val Day = 86400000000L

  test("deepest in-order prefix within the anchor window; best anchor " +
    "wins; anchorless users absent") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: anchor A at day 0 — click lands at day 1 + 1h, OUTSIDE
      // A's 24h window; anchor B at day 1 — same click is INSIDE, and
      // the purchase follows inside too → depth 3 via B
      (ts("2024-01-01 00:00:00"), 1L, 1L, "signup"),
      (ts("2024-01-02 00:00:00"), 1L, 2L, "signup"),
      (ts("2024-01-02 01:00:00"), 1L, 3L, "click"),
      (ts("2024-01-02 02:00:00"), 1L, 4L, "purchase"),
      // user 2: signup then click in-window, purchase BEFORE the click
      // (order violated) → depth 2
      (ts("2024-01-01 00:00:00"), 2L, 5L, "signup"),
      (ts("2024-01-01 01:00:00"), 2L, 6L, "purchase"),
      (ts("2024-01-01 02:00:00"), 2L, 7L, "click"),
      // user 3: no signup anchor → absent
      (ts("2024-01-01 00:00:00"), 3L, 8L, "click"),
      // user 4: signup only → depth 1
      (ts("2024-01-01 00:00:00"), 4L, 9L, "signup")
    ).toDF("ts", "user_id", "event_id", "event_type")
    val got = Sessionize.windowFunnel(ev,
        Seq("signup", "click", "purchase"), Day)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("a purchase at the exact click instant counts (at-or-after " +
    "chain semantics)") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (ts("2024-01-01 00:00:00"), 1L, 1L, "signup"),
      (ts("2024-01-01 05:00:00"), 1L, 2L, "click"),
      (ts("2024-01-01 05:00:00"), 1L, 3L, "purchase")
    ).toDF("ts", "user_id", "event_id", "event_type")
    val got = Sessionize.windowFunnel(ev,
        Seq("signup", "click", "purchase"), Day)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L))
  }

  test("patternSpans: completed matches only, earliest step per " +
      "anchor, same-instant anchors collapse") {
    val s = spark
    import s.implicits._
    def us(t: String) = ts(t).getTime * 1000L
    val ev = Seq(
      // user 1: two anchors — day-1 anchor completes (click+purchase
      // inside 24h), day-3 anchor's click lands outside its window
      (ts("2024-01-01 00:00:00"), 1L, 1L, "signup"),
      (ts("2024-01-01 01:00:00"), 1L, 2L, "click"),
      (ts("2024-01-01 01:30:00"), 1L, 3L, "click"), // later: ignored
      (ts("2024-01-01 02:00:00"), 1L, 4L, "purchase"),
      (ts("2024-01-03 00:00:00"), 1L, 5L, "signup"),
      (ts("2024-01-05 00:00:00"), 1L, 6L, "click"),
      // user 2: duplicate same-instant anchors → ONE span
      (ts("2024-01-02 00:00:00"), 2L, 7L, "signup"),
      (ts("2024-01-02 00:00:00"), 2L, 8L, "signup"),
      (ts("2024-01-02 01:00:00"), 2L, 9L, "click"),
      (ts("2024-01-02 02:00:00"), 2L, 10L, "purchase"),
      // user 3: chain dies (no purchase) → no span
      (ts("2024-01-01 00:00:00"), 3L, 11L, "signup"),
      (ts("2024-01-01 01:00:00"), 3L, 12L, "click")
    ).toDF("ts", "user_id", "event_id", "event_type")
    val got = Sessionize.patternSpans(ev,
        Seq("signup", "click", "purchase"), Day)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = Set(
      (1L, us("2024-01-01 00:00:00"), us("2024-01-01 01:00:00"),
        us("2024-01-01 02:00:00")),
      (2L, us("2024-01-02 00:00:00"), us("2024-01-02 01:00:00"),
        us("2024-01-02 02:00:00")))
    assert(got == want)
  }
}
