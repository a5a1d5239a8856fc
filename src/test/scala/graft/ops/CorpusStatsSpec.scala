package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

/** vocabGrowth and arrivalDispersion: hand-computed exact values. */
class CorpusStatsSpec extends SparkSuite {

  test("vocabGrowth counts first-seen vocabulary at each cutoff") {
    val s = spark
    import s.implicits._
    // 5 docs, ids 0..4 -> cutoffs 1,2,3,4,5
    val docs = Seq(
      (0L, "a b"),     // vocab {a,b}       tokens 2
      (1L, "b c"),     // +{c}              tokens 2
      (2L, "a b c"),   // +{}               tokens 3
      (3L, "d"),       // +{d}              tokens 1
      (4L, "e e e")    // +{e}              tokens 3
    ).toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> ((2L, 2L)), 2L -> ((3L, 4L)), 3L -> ((3L, 7L)),
      4L -> ((4L, 8L)), 5L -> ((5L, 11L))))
  }

  test("arrivalDispersion: D=1 boundary cases computed exactly") {
    val s = spark
    import s.implicits._
    def t(h: Int, m: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // "steady": 2 events in each of hours 0,1,2  -> variance 0, D = 0
    // "bursty": hours 0..2 with counts 6,0,0     -> var 12, mean 2, D = 6
    val ev = (Seq.tabulate(3)(h => (t(h), "steady")) ++
      Seq.tabulate(3)(h => (t(h, 30), "steady")) ++
      Seq.tabulate(6)(i => (t(0, i + 1), "bursty")) ++
      // anchor bursty's grid: one type spans all hours via "steady"
      Seq.empty)
      .zipWithIndex
      .map { case ((ts, ty), i) => (i.toLong, ts, ty) }
      .toDF("event_id", "ts", "event_type")
    val got = TimeSeries.arrivalDispersion(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // common grid = hours 0..2 (n=3)
    // steady: counts 2,2,2: S1=6 S2=12, D=(3*12-36)/(2*6)=0
    assert(got("steady") == ((3L, 6L, 12L, 0.0)))
    // bursty: counts 6,0,0: S1=6 S2=36, D=(3*36-36)/(2*6)=72/12=6
    assert(got("bursty") == ((3L, 6L, 36L, 6.0)))
  }
}
