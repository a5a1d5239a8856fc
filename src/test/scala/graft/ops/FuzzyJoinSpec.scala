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
}
