package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Exact set-similarity join: result must equal the brute-force
  * all-pairs Jaccard computed locally (the prefix filter is lossless
  * by theorem; this pins the implementation to it), and the prefix
  * stage must actually prune — fewer candidate rows than all pairs.
  */
class SetSimJoinSpec extends SparkSuite {

  private def bruteForce(rows: Seq[(Long, String)], num: Int, den: Int)
  : Set[(Long, Long, Int, Int, Int)] = {
    def sh(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty
      else (0 to w.length - 3)
        .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val sets = rows.map { case (id, t) => id -> sh(t) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter * den >= num * (sa.size + sb.size - inter)
    } yield (a, b, inter, sa.size, sb.size)).toSet
  }

  test("prefix-filtered join equals brute force at tau=0.6") {
    val s = spark
    import s.implicits._
    // two near-dup clusters + unrelated docs + a sub-3-token doc
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "a completely different sentence about spark engines"),
      (4L, "a completely different sentence about spark engines"),
      (5L, "short one"),
      (6L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
    )
    val got = SetSimJoin.jaccardJoin(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt,
        r.getLong(3).toInt, r.getLong(4).toInt)).toSet
    assert(got == bruteForce(rows, 6, 10), s"got $got")
    // the identical pair must be there with jaccard exactly 1.0
    assert(got.exists { case (a, b, i, na, nb) =>
      a == 3L && b == 4L && i == na && i == nb })
  }

  test("probeDelta equals brute-force delta-vs-corpus, including " +
    "docs whose unseen shingles reorder the prefix") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different sentence about spark engines here"),
      (3L, "one two three four five six seven eight nine ten"))
    // 10: near-dup of corpus 1 with UNSEEN leading shingles (df=0
    // sorts first — the prefix must still catch the common ones);
    // 11: exact copy of corpus 3; 12: unrelated; 13: too short
    val delta = Seq(
      (10L, "zz qq the quick brown fox jumps over the lazy dog today"),
      (11L, "one two three four five six seven eight nine ten"),
      (12L, "nothing here overlaps with anything in the corpus set"),
      (13L, "so short"))
    def sh(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty
      else (0 to w.length - 3)
        .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val want = (for {
      (a, ta) <- delta; (b, tb) <- corpus
      sa = sh(ta); sb = sh(tb) if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if inter * 10 >= 6 * (sa.size + sb.size - inter)
    } yield (a, b, inter, sa.size, sb.size)).toSet
    val idx = SetSimJoin.prefixIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text")
    val got = SetSimJoin.probeDelta(delta.toDF("doc_id", "text"),
        idx, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2).toInt, r.getLong(3).toInt, r.getLong(4).toInt))
      .toSet
    assert(got == want, s"got $got want $want")
    assert(want.exists(_._1 == 10L),
      "the unseen-shingle near-dup must be a real case")
    assert(want.exists(_._1 == 11L))
  }

  test("property: prefix-filtered join equals brute force over random " +
    "small-vocabulary corpora (the worst case for bucket skew)") {
    val s = spark
    import s.implicits._
    // small vocabulary -> heavy shingle sharing -> the prefix filter
    // earns its keep or silently loses pairs; seeded for replay
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 0 until 3) {
      val rows = (0L until 40L).map { i =>
        val n = 3 + rnd.nextInt(10)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      for ((num, den) <- Seq((4, 10), (6, 10), (9, 10))) {
        val got = SetSimJoin.jaccardJoin(rows.toDF("doc_id", "text"),
            "doc_id", "text", num, den)
          .select(col("doc_a"), col("doc_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = bruteForce(rows, num, den)
          .map(t => (t._1, t._2))
        assert(got == want,
          s"trial=$trial tau=$num/$den: missing=${want -- got} " +
            s"extra=${got -- want}")
      }
    }
  }

  test("tau=1 keeps only identical sets") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "w x y z q"), (2L, "w x y z q"), (3L, "w x y z r"))
    val got = SetSimJoin.jaccardJoin(rows.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 1, tauDen = 1)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
