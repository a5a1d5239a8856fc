package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.GraftFunctions

/** N4 — Misra–Gries sketch + verify (heavyHitters) and the
  * deterministic global training shuffle (globalShuffle).
  */
class HeavyHittersSpec extends SparkSuite {

  /** 3 planted heavy terms + a long tail much wider than the sketch
    * capacity, shuffled across partitions.
    */
  private def skewed = {
    val s = spark
    import s.implicits._
    val heavy = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(120)("gamma")
    val tail = (0 until 400).map(i => s"rare$i")
    val words = scala.util.Random.shuffle(
      new scala.util.Random(42).shuffle(heavy ++ tail)).mkString(" ")
    // one long doc + filler docs so multiple partitions see tokens
    (words.split(" ").grouped(64).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text").repartition(7)
  }

  test("heavyHitters returns EXACTLY the freq*theta > N set even when " +
    "the tail dwarfs sketch capacity") {
    val out = TextOps.heavyHitters(skewed, "text", theta = 8,
        capacity = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = 1020; threshold N/8 = 127.5 → alpha(300), beta(200) pass;
    // gamma(120) and every rare* fail
    assert(out === Map("alpha" -> 300L, "beta" -> 200L), s"got $out")
  }

  test("Misra-Gries candidates are a superset of true heavy hitters " +
    "at every partitioning") {
    for (nPart <- Seq(1, 3, 13)) {
      val cand = skewed.repartition(nPart)
        .select(explode(split(col("text"), " ")).as("term"))
        .agg(GraftFunctions.mgCandidates(col("term"), 16))
        .head().getSeq[String](0).toSet
      assert(Set("alpha", "beta", "gamma").subsetOf(cand),
        s"nPart=$nPart lost a heavy hitter: $cand")
      assert(cand.size <= 16, s"capacity violated: ${cand.size}")
    }
  }

  test("graft_mg_candidates works through the SQL registration path") {
    skewed.createOrReplaceTempView("hh_docs")
    val cand = spark.sql(
      """SELECT graft_mg_candidates(term, 16) FROM
        |  (SELECT explode(split(text, ' ')) AS term FROM hh_docs)"""
        .stripMargin)
      .head().getSeq[String](0).toSet
    assert(Set("alpha", "beta", "gamma").subsetOf(cand))
  }

  test("heavyHitters on an empty corpus returns no rows") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.heavyHitters(empty, "text").count() === 0L)
  }

  test("property: MG candidates are a superset of exact heavy hitters " +
    "for random zipf-ish streams at random partitionings") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 8) {
      val termGen = Gen.frequency(
        (8, Gen.oneOf("hot1", "hot2", "hot3")),
        (4, Gen.oneOf((0 until 20).map(i => s"warm$i"))),
        (3, Gen.choose(0, 5000).map(i => s"cold$i")))
      val terms = Gen.listOfN(2000, termGen).sample.get
      val capacity = 8 + rng.nextInt(24)
      val n = terms.length.toLong
      val exactHH = terms.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * (capacity + 1) > n }.keySet.toSet
      val cand = terms.toDF("term").repartition(1 + rng.nextInt(9))
        .agg(GraftFunctions.mgCandidates(col("term"), capacity))
        .head().getSeq[String](0).toSet
      assert(exactHH.subsetOf(cand),
        s"trial $trial capacity $capacity lost ${exactHH diff cand}")
      assert(cand.size <= capacity)
    }
  }

  test("globalShuffle: every doc placed once, per-shard positions are " +
    "contiguous from 1, placement is reproducible") {
    val s = spark
    import s.implicits._
    val docs = (0L until 500L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val a = CorpusOps.globalShuffle(docs, "doc_id", nShards = 8).collect()
    assert(a.length === 500 && a.map(_.getLong(0)).distinct.length === 500)
    val byShard = a.groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    byShard.foreach { case (sh, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.head === 1L && ps.last === ps.length.toLong,
        s"shard $sh positions not contiguous: ${ps.take(5).toSeq}…")
    }
    val b = CorpusOps.globalShuffle(docs.repartition(11), "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(b === a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      "placement must not depend on input partitioning")
  }
}
