package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Salted joins must be row-identical to the plain join and actually
  * spread a hot key across salt buckets.
  */
class SkewSpec extends SparkSuite {

  test("salted join equals the plain join on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of rows carry key 7 (the hot key)
    val large = (0 until 5000).map { i =>
      val k = if (i % 10 == 0) (i % 50).toLong else 7L
      (k, i.toLong)
    }.toDF("k", "payload")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = large.join(dim, "k")
      .select("k", "payload", "name").collect()
      .map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, dim, "k", saltBy = "payload")
      .select("k", "payload", "name").collect()
      .map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 5000)
  }

  test("null saltBy values keep their rows (row-identity holds)") {
    val s = spark
    import s.implicits._
    // saltBy column nullable: a null salt would never match the
    // replicated 0..N-1 salts and silently drop the row — the salt
    // must coalesce to a real bucket instead
    val large = Seq((1L, Some(10L)), (1L, None), (2L, None), (2L, Some(3L)))
      .toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val plain = large.join(dim, "k")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, dim, "k", saltBy = "payload")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 4, "null-payload rows must survive the join")
  }

  test("timeProximityCount auto-salts hot buckets and stays " +
    "row-identical under burst traffic") {
    val s = spark
    import s.implicits._
    // burst: 400 events inside one 60-second bucket (≫ the threshold),
    // plus sparse singles two minutes apart (below it)
    val rows = (0 until 400).map(i => (i.toLong, 60L + (i % 50))) ++
      (0 until 20).map(i => (1000L + i, 10000L + i * 120L))
    val ev = rows.toDF("event_id", "sec")
      .select(col("event_id"),
        timestamp_micros(col("sec") * 1000000L).as("ts"))
    def collectCounts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // saltBuckets=1 disables the census + two-path split entirely
    val plain = collectCounts(
      AsOf.timeProximityCount(ev, "event_id", "ts", 60, saltBuckets = 1))
    val salted = collectCounts(
      AsOf.timeProximityCount(ev, "event_id", "ts", 60,
        hotBucketThreshold = 100, saltBuckets = 8))
    assert(salted == plain,
      "the salted two-path join must be row-identical to the plain join")
    // burst rows all see the other 399; sparse rows see nobody
    assert((0 until 400).forall(i => salted(i.toLong) == 399L))
    assert((0 until 20).forall(i => salted(1000L + i) == 0L))
  }

  test("the hot key spreads across salt buckets") {
    val s = spark
    import s.implicits._
    val hot = (0 until 1000).map(i => (7L, i.toLong)).toDF("k", "payload")
    val buckets = hot
      .withColumn("__salt", Skew.salt(col("payload"), 8))
      .groupBy("__salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets.keySet == (0 until 8).toSet,
      s"hot key must hit every salt bucket: $buckets")
    assert(buckets.values.max < 1000L * 3 / 8,
      s"salting should spread roughly evenly: $buckets")
  }
}
