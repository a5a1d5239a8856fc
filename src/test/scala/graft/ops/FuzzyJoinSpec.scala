package graft.ops

import graft.SparkSuite

class FuzzyJoinSpec extends SparkSuite {

  /** Reference Levenshtein for the brute-force model. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(vocab: Seq[String],
                         k: Int = 1): Set[(String, String)] =
    (for {
      a <- vocab; b <- vocab
      if a < b && lev(a, b) <= k
    } yield (a, b)).toSet

  test("editDistancePairs finds exactly the distance-1 pairs") {
    val s = spark
    import s.implicits._
    val vocab = Seq("color", "colour", "colors", "dolor", "cat", "cast",
      "cart", "ct", "a", "b", "ab", "ba", "graft", "craft", "draft",
      "xylophone")
    val got = FuzzyJoin.editDistancePairs(vocab.toDF("tok"), "tok")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = bruteForce(vocab).map { case (a, b) => (a, b, 1L) }
    assert(got == want)
    // sanity: the interesting shapes are present
    assert(got.contains(("color", "colour", 1L))) // insertion
    assert(got.contains(("color", "dolor", 1L)))  // substitution
    assert(got.contains(("cat", "ct", 1L)))       // deletion
    // and the classic false candidate is killed: "ab"/"ba" share the
    // deletion signature "a" (and "b") but are at distance 2
    assert(!got.exists(p => p._1 == "ab" && p._2 == "ba"))
  }

  test("signature completeness: random vocab over a tiny alphabet") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    // tiny alphabet + short strings = dense distance-1 neighborhoods
    // and many shared-signature false candidates
    val vocab = Seq.fill(300)(
      (0 until (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString).distinct
    val got = FuzzyJoin.editDistancePairs(vocab.toDF("tok"), "tok")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == bruteForce(vocab))
    assert(got.nonEmpty)
  }

  test("maxDist = 2: depth-2 deletion neighborhoods find exactly the " +
    "distance <= 2 pairs") {
    val s = spark
    import s.implicits._
    val vocab = Seq("color", "colour", "colours", "dolor", "dollar",
      "cat", "cast", "cars", "ct", "c", "graft", "raft", "rat",
      "xylophone", "ab", "ba", "abcd", "dcba")
    val got = FuzzyJoin.editDistancePairs(vocab.toDF("tok"), "tok",
        maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = bruteForce(vocab, 2).map { case (a, b) =>
      (a, b, lev(a, b).toLong)
    }
    assert(got == want)
    assert(got.contains(("color", "colours", 2L))) // two insertions
    assert(got.contains(("ab", "ba", 2L)))         // transposition = 2
    assert(!got.exists(p => p._1 == "abcd" && p._2 == "dcba"))
  }

  test("maxDist = 2 on random tiny-alphabet vocab (dense false " +
    "candidates)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val vocab = Seq.fill(150)(
      (0 until (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString).distinct
    val got = FuzzyJoin.editDistancePairs(vocab.toDF("tok"), "tok",
        maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == bruteForce(vocab, 2))
    assert(got.nonEmpty)
  }

  test("vocabFuzzyPairs: deterministic top-k vocabulary, empty-token-free") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cut sat  on a mat"), // double space → empty token
      (3L, "a bat and the cat")
    ).toDF("doc_id", "text")
    val got = FuzzyJoin.vocabFuzzyPairs(docs, "text", topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val vocab = Seq("the", "cat", "sat", "on", "mat", "cut", "a", "bat",
      "and")
    assert(got == bruteForce(vocab))
    assert(got.contains(("cat", "cut")))
    assert(got.contains(("bat", "cat")))
    assert(!got.exists(p => p._1.isEmpty || p._2.isEmpty))
  }

  test("linkRecords: blocked brute-force model, dist-0 pairs included, " +
      "ids ordered, agreement scored") {
    val s = spark
    import s.implicits._
    val recs = Seq(
      // block 1: two near names (dist 1) with agreeing segment,
      // an exact duplicate name pair (dist 0), and a far name
      (1L, "acme corp", 1, "retail"),
      (2L, "acme c0rp", 1, "retail"),
      (3L, "zzz industries", 1, "retail"),
      (4L, "acme corp", 1, "bank"),
      // block 2: same near names as block 1 — must NOT link across
      (5L, "acme corp", 2, "retail"),
      (6L, "acme korp", 2, "auto"))
      .toDF("id", "name", "nat", "seg")
    val got = FuzzyJoin.linkRecords(recs, "id", "name", "nat",
        Seq("seg"), maxDist = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // brute-force model: same block, id_a < id_b, lev <= 2
    val rows = Seq((1L, "acme corp", 1, "retail"),
      (2L, "acme c0rp", 1, "retail"), (3L, "zzz industries", 1, "retail"),
      (4L, "acme corp", 1, "bank"), (5L, "acme corp", 2, "retail"),
      (6L, "acme korp", 2, "auto"))
    val want = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1 && lev(a._2, b._2) <= 2
    } yield {
      val d = lev(a._2, b._2).toLong
      val ag = if (a._4 == b._4) 1L else 0L
      (a._1, b._1, a._3, d, ag, 2L - d + ag)
    }).toSet
    assert(got == want)
    assert(got.contains((1L, 2L, 1, 1L, 1L, 2L)), "near pair, agree")
    assert(got.contains((1L, 4L, 1, 0L, 0L, 2L)), "exact-dup names")
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L),
      "no cross-block link")
  }

  test("goldenRecord: linked cluster merges under the written rules; " +
      "singletons and cross-block same-names pass through") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // (id, name, block, segment, cents): 1~2 link (dist 1, same
    // block); 3 is a block-1 singleton; 4 repeats name "ann" in
    // block 2 → must NOT merge across blocks
    val recs = Seq(
      (1L, "ann", 1L, "A", 100L), (2L, "anne", 1L, "B", 300L),
      (3L, "bob", 1L, "A", 50L), (4L, "ann", 2L, "A", 77L))
      .toDF("id", "nm", "blk", "seg", "cents")
    val got = graft.ops.FuzzyJoin.goldenRecord(recs, "id", "nm",
        "blk", "seg", col("cents"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getString(5))).toMap
    assert(got.keySet == Set(1L, 3L, 4L))
    // cluster {1,2}: longest name wins, max cents, modal tie -> "B"
    assert(got(1L) == ((2L, 1L, "anne", 300L, "B")))
    assert(got(3L) == ((1L, 1L, "bob", 50L, "A")))
    assert(got(4L) == ((1L, 2L, "ann", 77L, "A")))
  }
}
