package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSuite

/** Edge semantics of the temporal operators that the DuckDB oracle
  * rows (`asof_join`, `range_prox`, `log_compact`, `snapshot_diff`,
  * `pii_scrub`) can't isolate: inclusive boundaries, tie-breaks,
  * no-match nulls, the `removed` branch, email masking.
  */
class AsOfSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: inclusive boundary, latest-wins tie-break, no-match nulls") {
    val s = spark
    import s.implicits._
    val clicks = Seq(
      (1L, 10L, ts("2026-01-01 00:00:10")),
      (1L, 11L, ts("2026-01-01 00:00:10")), // same ts — higher id wins
      (1L, 12L, ts("2026-01-01 00:00:30")),
      (2L, 20L, ts("2026-01-01 00:05:00")))
      .toDF("user_id", "click_id", "click_ts")
    val purchases = Seq(
      (1L, 100L, ts("2026-01-01 00:00:10")), // equal ts → inclusive
      (1L, 101L, ts("2026-01-01 00:00:29")), // before click 12
      (1L, 102L, ts("2026-01-01 00:00:30")), // equal ts with click 12
      (2L, 200L, ts("2026-01-01 00:04:59")), // BEFORE any click → null
      (3L, 300L, ts("2026-01-01 00:00:01"))) // key with no clicks at all
      .toDF("user_id", "purchase_id", "purchase_ts")
    val got = AsOf.asofJoin(clicks, purchases, "user_id",
      "click_ts", "purchase_ts", "click_id")
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(100L -> 11L, 101L -> 11L, 102L -> 12L,
      200L -> -1L, 300L -> -1L))
  }

  test("asofJoinForward: inclusive boundary, earliest-wins tie-break, " +
    "no-match nulls, null-ts probe routed around the merge") {
    val s = spark
    import s.implicits._
    val clicks = Seq(
      (1L, Some(10L), Some(ts("2026-01-01 00:00:10"))),
      (1L, Some(11L), Some(ts("2026-01-01 00:00:10"))), // same ts — LOWER id wins
      (1L, Some(12L), Some(ts("2026-01-01 00:00:30"))),
      (1L, Some(13L), None), // null-ts build row: dropped
      (2L, Some(20L), Some(ts("2026-01-01 00:05:00"))))
      .toDF("user_id", "click_id", "click_ts")
    val purchases = Seq(
      (1L, 100L, Some(ts("2026-01-01 00:00:10"))), // equal ts → inclusive
      (1L, 101L, Some(ts("2026-01-01 00:00:11"))), // next is click 12
      (1L, 102L, Some(ts("2026-01-01 00:00:31"))), // AFTER all clicks → null
      (2L, 200L, Some(ts("2026-01-01 00:04:59"))), // before click 20
      (3L, 300L, Some(ts("2026-01-01 00:00:01"))), // key with no clicks
      (1L, 103L, None)) // null-ts probe: unmatched, not first-of-key
      .toDF("user_id", "purchase_id", "purchase_ts")
    val got = AsOf.asofJoinForward(clicks, purchases, "user_id",
      "click_ts", "purchase_ts", "click_id")
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(100L -> 10L, 101L -> 12L, 102L -> -1L,
      200L -> 20L, 300L -> -1L, 103L -> -1L))
  }

  test("property: asofJoinForward equals the naive earliest-at-or-after " +
    "pick") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val builds = (1 to 120).map(i =>
      (rnd.nextInt(6).toLong, i.toLong, ts(f"2026-01-01 00:${rnd.nextInt(50)}%02d:${rnd.nextInt(60)}%02d")))
    val probes = (1 to 80).map(i =>
      (rnd.nextInt(8).toLong, (1000 + i).toLong, ts(f"2026-01-01 00:${rnd.nextInt(50)}%02d:${rnd.nextInt(60)}%02d")))
    val b = builds.toDF("user_id", "click_id", "click_ts")
    val p = probes.toDF("user_id", "purchase_id", "purchase_ts")
    val got = AsOf.asofJoinForward(b, p, "user_id",
      "click_ts", "purchase_ts", "click_id")
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val want = probes.map { case (u, pid, pts) =>
      val cands = builds.filter(bb => bb._1 == u && !bb._3.before(pts))
      pid -> (if (cands.isEmpty) -1L
              else cands.minBy(bb => (bb._3.getTime, bb._2))._2)
    }.toMap
    assert(got === want)
  }

  test("asofJoin never matches null keys (join semantics)") {
    val s = spark
    import s.implicits._
    val clicks = Seq((Option.empty[Long], 1L, ts("2026-01-01 00:00:00")))
      .toDF("user_id", "click_id", "click_ts")
    val purchases = Seq((Option.empty[Long], 100L, ts("2026-01-01 00:01:00")),
      (Some(5L), 101L, ts("2026-01-01 00:01:00")))
      .toDF("user_id", "purchase_id", "purchase_ts")
    val got = AsOf.asofJoin(clicks, purchases, "user_id",
      "click_ts", "purchase_ts", "click_id")
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    // both probes survive (left semantics) but neither matches: the
    // null-key build row is dropped, never grouped-and-"matched"
    assert(got === Map(100L -> true, 101L -> true))
  }

  test("snapshotDiff on key-only snapshots does presence-only classification") {
    val s = spark
    import s.implicits._
    val got = Relational.snapshotDiff(
      Seq(1L, 2L).toDF("k"), Seq(2L, 3L).toDF("k"), "k")
      .select("k", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"))
  }

  test("asofJoin row count equals probe row count (left semantics)") {
    val s = spark
    import s.implicits._
    val clicks = Seq((1L, 1L, ts("2026-01-01 00:00:00")))
      .toDF("user_id", "click_id", "click_ts")
    val purchases = (1 to 50).map(i =>
      (i.toLong % 3, 100L + i, ts(f"2026-01-01 00:00:${i % 60}%02d")))
      .toDF("user_id", "purchase_id", "purchase_ts")
    assert(AsOf.asofJoin(clicks, purchases, "user_id",
      "click_ts", "purchase_ts", "click_id").count() === 50L)
  }

  test("timeProximityCount matches the naive all-pairs count") {
    val s = spark
    import s.implicits._
    // cluster boundaries sit exactly on and just over the ±60 s bound,
    // and rows land in adjacent buckets (95→35 crosses a 60 s bucket)
    val secs = Seq(0L, 30L, 60L, 90L, 95L, 121L, 500L, 1000L, 1059L, 1061L)
    val ev = secs.zipWithIndex.map { case (sec, i) =>
      (i.toLong, new Timestamp(sec * 1000L))
    }.toDF("event_id", "ts")
    val got = AsOf.timeProximityCount(ev, "event_id", "ts", 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = secs.zipWithIndex.map { case (sec, i) =>
      i.toLong -> secs.zipWithIndex.count { case (o, j) =>
        j != i && math.abs(o - sec) <= 60
      }.toLong
    }.toMap
    assert(got === naive)
  }

  test("intervalJoin matches the naive all-pairs overlap, exactly once each") {
    val s = spark
    import s.implicits._
    // seconds-scale closed intervals with bucketSec=10: touching
    // endpoints, containment spanning several buckets, disjoint, and
    // overlaps that straddle bucket boundaries
    val aIv = Seq((1L, 0L, 5L), (2L, 9L, 21L), (3L, 35L, 36L),
      (4L, 0L, 100L), (5L, 50L, 50L))
    val bIv = Seq((10L, 5L, 8L), (11L, 20L, 34L), (12L, 36L, 49L),
      (13L, 101L, 120L), (14L, 50L, 50L))
    def df(rows: Seq[(Long, Long, Long)], p: String) =
      rows.map { case (i, st, en) =>
        (i, new Timestamp(st * 1000L), new Timestamp(en * 1000L))
      }.toDF(s"${p}_id", s"${p}_start", s"${p}_end")
    val got = AsOf.intervalJoin(df(aIv, "a"), df(bIv, "b"),
      "a_start", "a_end", "b_start", "b_end", bucketSec = 10L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = for {
      (ai, as_, ae) <- aIv
      (bi, bs, be) <- bIv
      if as_ <= be && bs <= ae
    } yield (ai, bi)
    assert(got.sorted === naive.sorted) // sorted Seq compare: dup emits fail
  }

  test("intervalJoin drops null-bounded and inverted (empty) intervals") {
    val s = spark
    import s.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // a-side: one well-formed, one null start, one null end, one
    // inverted (end < start) that would pathologically "overlap" a
    // containing b-interval under the raw predicate
    val a = Seq(
      (1L, Option(ts(10)), Option(ts(20))),
      (2L, None, Option(ts(20))),
      (3L, Option(ts(10)), None),
      (4L, Option(ts(40)), Option(ts(30))))
      .toDF("a_id", "a_start", "a_end")
    val b = Seq(
      (10L, Option(ts(0)), Option(ts(100))), // contains everything
      (11L, None, Option(ts(100))))          // null on the b side too
      .toDF("b_id", "b_start", "b_end")
    val got = AsOf.intervalJoin(a, b, "a_start", "a_end",
      "b_start", "b_end", bucketSec = 10L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the well-formed a row × the well-formed b row survives
    assert(got == Set((1L, 10L)),
      s"null/inverted intervals must be dropped, got $got")
  }

  test("property: asofJoin equals the naive latest-at-or-before pick") {
    val s = spark
    import s.implicits._
    val rowGen = for {
      key <- Gen.choose(0L, 4L)
      us <- Gen.choose(0L, 100L)
    } yield (key, us)
    for (trial <- 1 to 5) {
      val builds = (1 to 40).flatMap(_ => rowGen.sample)
        .zipWithIndex.map { case ((k, us), i) => (k, 1000L + i, us) }
      val probes = (1 to 40).flatMap(_ => rowGen.sample)
        .zipWithIndex.map { case ((k, us), i) => (k, 2000L + i, us) }
      val bDf = builds.toDF("user_id", "click_id", "bus")
        .select(col("user_id"), col("click_id"),
          timestamp_micros(col("bus")).as("click_ts"))
      val pDf = probes.toDF("user_id", "purchase_id", "pus")
        .select(col("user_id"), col("purchase_id"),
          timestamp_micros(col("pus")).as("purchase_ts"))
      val got = AsOf.asofJoin(bDf, pDf, "user_id",
        "click_ts", "purchase_ts", "click_id")
        .select("purchase_id", "click_id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val naive = probes.map { case (k, pid, pus) =>
        val cands = builds.filter { case (bk, _, bus) => bk == k && bus <= pus }
        pid -> (if (cands.isEmpty) -1L
                else cands.maxBy { case (_, bid, bus) => (bus, bid) }._2)
      }.toMap
      assert(got === naive, s"trial $trial")
    }
  }

  test("property: intervalJoin equals naive overlap on random interval sets") {
    val s = spark
    import s.implicits._
    val ivGen = for {
      st <- Gen.choose(0L, 500L)
      len <- Gen.choose(0L, 80L) // zero-length and multi-bucket intervals
    } yield (st, st + len)
    for (trial <- 1 to 5) {
      val aIv = (1 to 25).flatMap(_ => ivGen.sample)
        .zipWithIndex.map { case ((st, en), i) => (i.toLong, st, en) }
      val bIv = (1 to 25).flatMap(_ => ivGen.sample)
        .zipWithIndex.map { case ((st, en), i) => (100L + i, st, en) }
      def df(rows: Seq[(Long, Long, Long)], p: String) =
        rows.map { case (i, st, en) =>
          (i, new Timestamp(st * 1000L), new Timestamp(en * 1000L))
        }.toDF(s"${p}_id", s"${p}_start", s"${p}_end")
      val got = AsOf.intervalJoin(df(aIv, "a"), df(bIv, "b"),
        "a_start", "a_end", "b_start", "b_end", bucketSec = 30L)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val naive = for {
        (ai, as_, ae) <- aIv
        (bi, bs, be) <- bIv
        if as_ <= be && bs <= ae
      } yield (ai, bi)
      assert(got.sorted === naive.sorted, s"trial $trial")
    }
  }

  test("logCompact keeps exactly the highest-offset record per key") {
    val s = spark
    import s.implicits._
    val decoded = Seq(
      ("u1", "v1", "t", 0, 1L, ts("2026-01-01 00:00:01")),
      ("u1", "v2", "t", 0, 5L, ts("2026-01-01 00:00:02")),
      ("u1", "v3", "t", 0, 3L, ts("2026-01-01 00:00:03")),
      ("u2", "w1", "t", 1, 2L, ts("2026-01-01 00:00:04")))
      .toDF("key_str", "value_str", "topic", "kpartition", "koffset", "ts")
    val got = StreamOps.logCompact(decoded)
      .select("key_str", "value_str", "koffset", "rnk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(("u1", "v2", 5L, 1L), ("u2", "w1", 2L, 1L)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safe") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None), (4L, Some(40L)))
      .toDF("k", "m")
    val neu = Seq((1L, Some(10L)), (2L, Some(21L)), (3L, None), (5L, Some(50L)))
      .toDF("k", "m")
    val got = Relational.snapshotDiff(old, neu, "k")
      .select("k", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 3: null metric on both sides must read as unchanged, not a
    // missing row — the <=> / marker-column distinction under test
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "added"))
  }

  test("piiScrub masks emails before digit runs and counts on the original") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "mail bob1234@ex.co and card 987654 end"),
      (2L, "no pii here"),
      (3L, "a@b.io x@y.org 42"))
      .toDF("id", "text")
    val rows = TextOps.piiScrub(docs, "id", "text", minDigits = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) === (("mail <EMAIL> and card <NUM> end", 1L, 2L)))
    assert(rows(2L) === (("no pii here", 0L, 0L)))
    assert(rows(3L) === (("<EMAIL> <EMAIL> 42", 2L, 0L)))
  }

  test("maintainAggregate: new keys appear, emptied keys drop, " +
      "updates shift sums without touching counts") {
    val s = spark
    import s.implicits._
    val summary = Seq((1L, 2L, 300L), (2L, 1L, 50L), (3L, 1L, 70L))
      .toDF("user_id", "n_events", "sum_cents")
    val changelog = Seq(
      // key 1: one delete (-1, -100), one update (+0, +25)
      (1L, "D", Some(100L), None), (1L, "U", Some(75L), Some(100L)),
      // key 2: delete its only row -> group must disappear
      (2L, "D", Some(50L), None),
      // key 9: insert to a key the summary has never seen
      (9L, "I", None, Some(40L)))
      .toDF("user_id", "op", "old_cents", "new_cents")
    val got = Relational.maintainAggregate(summary, changelog, "user_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> ((1L, 225L)), // 300 - 100 + (100 - 75)
      3L -> ((1L, 70L)),  // untouched key passes through
      9L -> ((1L, 40L))), s"got $got")
  }

  test("robustAnomalies: lower median on even counts, MAD=0 groups, " +
      "strict k*MAD boundary") {
    val s = spark
    import s.implicits._
    // group a: values 1,2,3,100 -> sorted rank (4+1) div 2 = 2 -> med=2;
    //   adevs 1,0,1,98 -> sorted 0,1,1,98 -> mad=1 -> anom iff adev>3
    // group b: 5,5,5,9 -> med=5, adevs 0,0,0,4 -> mad=0 -> anom iff adev>0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0)).toDF("g", "v")
    val got = Relational.robustAnomalies(df, "g", "v")
      .select("g", "v", "med", "mad", "is_anom")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(("a", 100.0)) === ((2.0, 1.0, true)))
    assert(got(("a", 3.0)) === ((2.0, 1.0, false)),
      "adev=1 <= 3*mad: not anomalous")
    assert(got(("b", 9.0)) === ((5.0, 0.0, true)), "MAD=0: any deviation flags")
    assert(got(("b", 5.0)) === ((5.0, 0.0, false)))
  }

  test("cdcApply: latest op wins, trailing tombstones drop the key, " +
      "resurrected keys survive") {
    val s = spark
    import s.implicits._
    // key 1: upsert, upsert            -> latest upsert kept
    // key 2: upsert, delete            -> absent (tombstoned)
    // key 3: upsert, delete, upsert    -> resurrected, latest kept
    // key 4: delete only               -> absent
    val log = Seq(
      (1L, 10L, "up", "a"), (1L, 20L, "up", "b"),
      (2L, 11L, "up", "c"), (2L, 21L, "del", ""),
      (3L, 12L, "up", "d"), (3L, 22L, "del", ""), (3L, 32L, "up", "e"),
      (4L, 13L, "del", ""))
      .toDF("k", "seq", "op", "payload")
    val got = Relational.cdcApply(log, Seq("k"), "seq",
        col("op") === "del")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .toSet
    assert(got == Set((1L, 20L, "b"), (3L, 32L, "e")))
  }

  test("pointInTimeJoin: latest valid version, exact-boundary picks " +
      "the NEW version, facts before the first version get nulls, " +
      "same-instant version chains resolve to the survivor") {
    val s = spark
    import s.implicits._
    def ts(t: String) = Timestamp.valueOf(t)
    // key 1: v1 at 01:00, v2 at 02:00, plus a same-instant chain at
    // 03:00 (two updates at one ts -> v3 is zero-length, v4 survives)
    val changes = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, 100L),
      (1L, ts("2024-01-01 02:00:00"), 2L, 200L),
      (1L, ts("2024-01-01 03:00:00"), 3L, 300L),
      (1L, ts("2024-01-01 03:00:00"), 4L, 400L))
      .toDF("k", "ts", "seq", "cents")
    val dim = Relational.scdType2(changes, "k", "ts", "seq",
      Seq("cents"))
    val facts = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10L), // before v1 -> nulls
      (1L, ts("2024-01-01 01:30:00"), 11L), // inside v1
      (1L, ts("2024-01-01 02:00:00"), 12L), // AT v2's start -> v2
      (1L, ts("2024-01-01 03:00:00"), 13L), // at the chain -> v4
      (1L, ts("2024-01-01 09:00:00"), 14L), // open-ended current
      (2L, ts("2024-01-01 01:00:00"), 15L)) // unknown key -> nulls
      .toDF("k", "ts", "fid")
    val got = AsOf.pointInTimeJoin(dim, facts, "k", "ts")
      .collect().map(r => r.getAs[Long]("fid") ->
        (Option(r.getAs[Any]("cents")), Option(r.getAs[Any]("version_n"))))
      .toMap
    assert(got(10L) == ((None, None)))
    assert(got(11L) == ((Some(100L), Some(1L))))
    assert(got(12L) == ((Some(200L), Some(2L))))
    assert(got(13L) == ((Some(400L), Some(4L))),
      "same-instant chain: the surviving (highest) version wins")
    assert(got(14L) == ((Some(400L), Some(4L))))
    assert(got(15L) == ((None, None)))
  }
}
