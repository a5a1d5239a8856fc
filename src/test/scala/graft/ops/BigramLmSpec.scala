package graft.ops

import graft.SparkSuite

/** bigramLm: the fixed-point bigram-likelihood quality gate. The score
  * must be exact integers (hand-computed here), docs without bigram
  * evidence must be absent, and the ranking must separate predictable
  * text from noise.
  */
class BigramLmSpec extends SparkSuite {

  test("fixed-point bigram scores match the hand computation") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams (a,b),(b,a),(a,b)
      (2L, "a b c"),   // bigrams (a,b),(b,c)
      (3L, "x")        // no bigrams: absent from the result
    ).toDF("doc_id", "text")
    // corpus: c(a,b)=3 c(b,a)=1 c(b,c)=1; prefixes a=3 b=2; V=4
    // fp(a,b) = 4*2^20 div 7 = 599186; fp(b,a) = fp(b,c)
    //         = 2*2^20 div 6 = 349525
    val got = TextOps.bigramLm(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((3L, 1547897L, 1547897.0 / 3)))
    assert(got(2L) == ((2L, 948711L, 948711.0 / 2)))
  }

  test("repetitive text outscores unique-bigram noise") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "q w e r t y u i o p z x")
    ).toDF("doc_id", "text")
    val avg = TextOps.bigramLm(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(avg(1L) > avg(2L),
      s"LM-predictable text must score higher: $avg")
  }
}
