package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables
import graft.ops.CorpusOps

/** Bloom layer: the no-false-negative guarantee (the exactness
  * contract of decontaminateBloom), a loose false-positive bound at
  * the designed bits-per-key, distributed-build/merge correctness,
  * and end-to-end row-identity of the bloomed decontamination with
  * the exact broadcast form.
  */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  test("no false negatives: every added key passes, even across merges") {
    val rnd = new scala.util.Random(42)
    val keys = Array.fill(20000)(rnd.nextLong())
    // 8 partitions forces map-side partials + OR-merge
    val df = spark.sparkContext.parallelize(keys.toSeq, 8).toDF("h")
    val bloom = GraftBloom.build(df, "h",
      GraftBloom.sizeBits(keys.length, 16), numHashes = 6)
    assert(keys.forall(bloom.mightContain),
      "a member key failed the probe — false negative")
  }

  test("false-positive rate is near design at 16 bits/key") {
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(20000)(rnd.nextLong())
    val df = spark.sparkContext.parallelize(keys.toSeq, 4).toDF("h")
    val bloom = GraftBloom.build(df, "h",
      GraftBloom.sizeBits(keys.length, 16), numHashes = 6)
    val inSet = keys.toSet
    val absent = Iterator.continually(rnd.nextLong())
      .filterNot(inSet).take(20000).toArray
    val fp = absent.count(bloom.mightContain).toDouble / absent.length
    info(f"fp rate = $fp%.5f (design ~4e-4 at 16 bits/key, 6 hashes)")
    assert(fp < 0.01, f"fp rate $fp%.5f way above design")
  }

  test("BloomMightContain filters inside the plan, codegen path") {
    val keys = (1L to 100L).map(GraftBloomFilter.fmix)
    val df = spark.sparkContext.parallelize(keys, 2).toDF("h")
    val bloom = GraftBloom.build(df, "h", 1024, 4)
    val passed = (1L to 200L).map(GraftBloomFilter.fmix).toDF("h")
      .filter(GraftFunctions.bloomMightContain(col("h"), bloom))
      .collect().map(_.getLong(0)).toSet
    // all 100 members pass; the other 100 mostly rejected
    assert(keys.toSet.subsetOf(passed))
    assert(passed.size < 200, "probe rejected nothing")
  }

  test("decontaminateBloom is row-identical to exact decontaminate") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val exact = rows(CorpusOps.decontaminate(docs, "doc_id", "text"))
    val bloomed = rows(CorpusOps.decontaminateBloom(docs, "doc_id", "text"))
    assert(exact == bloomed)
    assert(exact.nonEmpty)
  }

  test("the Bloom pre-filter actually prunes the gram stream") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = docs.select(col("doc_id"),
      graft.ops.TextOps.splitAssign(col("text")).as("split"),
      graft.ops.TextOps.wordShingles(col("text"), 3).as("s"))
    val evalGrams = sh.filter(col("split") === "test")
      .select(explode(col("s")).as("g")).distinct()
    val n = math.max(1L, evalGrams.count())
    val bloom = GraftBloom.build(
      evalGrams.select(xxhash64(col("g")).as("h")), "h",
      GraftBloom.sizeBits(n, 16), 6)
    val trainGrams = sh.filter(col("split") === "train")
      .select(explode(col("s")).as("g"))
    val total = trainGrams.count()
    val passed = trainGrams
      .filter(GraftFunctions.bloomMightContain(xxhash64(col("g")), bloom))
      .count()
    val trueHits = trainGrams.join(broadcast(evalGrams), "g").count()
    info(s"grams: total=$total passed=$passed trueHits=$trueHits")
    assert(passed >= trueHits, "bloom dropped a true hit")
    assert(passed < total, "bloom pruned nothing")
  }

  test("bloom_semijoin: key Bloom prunes the fact side, never a match") {
    val d = "/root/testdata/sf0.001"
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = GraftBloom.build(
      urgent.select(col("o_orderkey").as("h")), "h",
      GraftBloom.sizeBits(math.max(1L, urgent.count()), 16), 6)
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"))
    val total = li.count()
    val passed = li
      .filter(GraftFunctions.bloomMightContain(col("l_orderkey"), bloom))
      .count()
    val trueHits = li
      .join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"))
      .count()
    info(s"lineitem: total=$total passed=$passed trueHits=$trueHits")
    assert(passed >= trueHits, "bloom dropped a matching fact row")
    // ~20% of orders are URGENT; with 16 bits/key the pass-through is
    // true matches + ~4e-4 false positives — far below the full scan
    assert(passed < total / 2, "bloom pruned too little to be useful")
  }
}
