package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.SparkSuite
import graft.engine.{CommitLog, KafkaShape, Monitoring}

/** SURVEY §5 operator-semantics units: A4 recovery invariant, M3 -1
  * semantics, P1/P2 null-key decode, S9 rowkey round-trip, P6 shard
  * filter.
  */
class SemanticsSpec extends SparkSuite {

  private def kafkaDf(rows: Seq[(Long, Long)]) = {
    // (partition, offset) → minimal Kafka-shaped frame
    val s = spark
    import s.implicits._
    rows.toDF("p", "offset").select(
      lit(null).cast(BinaryType).as("key"),
      lit("x").cast(BinaryType).as("value"),
      lit("events").as("topic"),
      col("p").cast(IntegerType).as("partition"),
      col("offset"),
      lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("timestamp"),
      lit(0).as("timestampType"))
  }

  test("dataAudit: one row per check; NULL predicates count as " +
    "violations; uniqueness rides the same pass") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), Some(10.0)),
      (Some(1L), Some(-5.0)),   // duplicate id + negative value
      (Some(2L), None),         // null value -> 'value_positive' UNKNOWN
      (None, Some(3.0)))        // null id
      .toDF("id", "v")
    val out = Relational.dataAudit(df,
      Seq("id_not_null" -> col("id").isNotNull,
        "value_positive" -> (col("v") > 0)),
      uniqueKeys = Seq("id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("id_not_null") === ((4L, 1L, false)))
    // -5 fails, NULL v is unknown => also a violation
    assert(out("value_positive") === ((4L, 2L, false)))
    // primary-key semantics: violations = rows - distinct NON-NULL
    // keys, so both the duplicate id 1 and the null id count (4-2=2)
    assert(out("unique:id") === ((4L, 2L, false)),
      s"uniqueness counts rows minus distinct non-null keys: $out")
  }

  test("A4 invariant: recovered offset is strictly above current, or 0") {
    // the reference picks the smallest broker offset > current, else 0
    // (reference `…InputDStream.scala:352-370`, find on ascending list
    // `:358-360`). Property over ScalaCheck-generated offset sets.
    val gen = for {
      part <- Gen.choose(0L, 7L)
      offs <- Gen.nonEmptyListOf(Gen.choose(0L, 1000L))
    } yield offs.map(o => (part, o))
    val rows = (1 to 50).flatMap(_ => gen.sample.getOrElse(Nil)).distinct
    for (current <- Seq(-1L, 0L, 250L, 999L, 2000L)) {
      val result = StreamOps.firstOffsetAbove(kafkaDf(rows), current)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byPart = rows.groupBy(_._1)
      result.foreach { case (p, recovered) =>
        val above = byPart(p).map(_._2).filter(_ > current)
        if (above.isEmpty) assert(recovered == 0L, s"p=$p cur=$current")
        else {
          assert(recovered == above.min, s"p=$p cur=$current")
          assert(recovered > current)
        }
      }
    }
  }

  test("M3: missing sides coalesce to -1 and lag only spans full rows") {
    val heads = kafkaDf(Seq((0L, 100L), (1L, 50L)))
    val commits = kafkaDf(Seq((1L, 40L), (2L, 10L)))
      .groupBy("topic", "partition")
      .agg(max("offset").as("offset"))
    val got = Monitoring.lagReport(heads, commits).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0L) == ((100L, -1L, -1L)), "committed side missing")
    assert(got(1L) == ((50L, 40L, 10L)), "both sides present")
    assert(got(2L) == ((-1L, 10L, -1L)), "head side missing")
  }

  test("P1/P2: null key decodes to null, value to utf8") {
    val df = kafkaDf(Seq((0L, 1L)))
    val r = KafkaShape.decodeUtf8(df).select("key_str", "value_str").head()
    assert(r.isNullAt(0), "null Kafka key must stay null (reference " +
      "`…InputDStream.scala:305-309`)")
    assert(r.getString(1) == "x")
  }

  test("S9 rowkey round-trip: partition parses back from the rowkey tail") {
    // the monitoring query re-derives partition from the rowkey
    // (reference `ProcessorMetrics.scala:70,79`: split('-').reverse.head)
    val df = kafkaDf(Seq((3L, 7L), (5L, 9L)))
      .select(col("topic"), col("partition"))
      .distinct()
      .withColumn("rowkey", CommitLog.rowkey("graft"))
    val got = df.select(
        col("partition"),
        element_at(split(col("rowkey"), "-"), -1).cast(IntegerType)
          .as("parsed"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("P6: shard filter owns exactly partition % consumers == id") {
    val df = kafkaDf((0L until 16L).map(p => (p, p * 10)))
    val cfg = KafkaShape.StreamConfig(consumerId = 2, consumersCount = 3)
    val owned = df.filter(KafkaShape.shardFilter(cfg))
      .select("partition").collect().map(_.getInt(0)).toSet
    assert(owned == (0 until 16).filter(_ % 3 == 2).toSet)
  }

  test("X1 fairness property: exactly-once ownership and balanced load " +
      "for arbitrary partition sets") {
    // the reference's work-steal scheduler must neither double-assign
    // nor starve a partition (reference `…InputDStream.scala:235-264`).
    // Property over ScalaCheck-generated ARBITRARY partition id sets
    // (sparse, unordered, beyond the default 0..7 range): every
    // partition satisfies exactly one consumer's shard predicate —
    // disjointness (no steal conflicts) and completeness (no
    // starvation) in one check — and over any contiguous partition
    // range the per-consumer load is balanced to within one partition.
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 4096L))
    for (n <- 1 to 6) {
      val parts =
        (1 to 30).flatMap(_ => gen.sample.getOrElse(Nil)).distinct
      val df = kafkaDf(parts.map(p => (p, p)))
      val owners = df.select(
        (0 until n).map(id =>
          KafkaShape.shardFilter(KafkaShape.StreamConfig(
            consumerId = id, consumersCount = n)).cast(IntegerType))
          .reduce(_ + _).as("owners"))
      assert(owners.filter(col("owners") =!= 1).count() == 0,
        s"n=$n: some partition owned by != 1 consumer")
      // balance over the contiguous space 0..P-1 (the real topic
      // layout): per-consumer loads COMPUTED THROUGH shardFilter on a
      // DataFrame — not re-derived in Scala — differ by at most 1
      for (p <- Seq(n, 17, 256)) {
        val contiguous = kafkaDf((0L until p.toLong).map(x => (x, x)))
        val loads = contiguous.select(
          (0 until n).map(id => sum(
            KafkaShape.shardFilter(KafkaShape.StreamConfig(
              consumerId = id, consumersCount = n))
              .cast(LongType)).as(s"c$id")): _*)
          .head().toSeq.map(_.asInstanceOf[Long])
        assert(loads.max - loads.min <= 1,
          s"n=$n P=$p: unbalanced loads $loads")
      }
    }
  }

  test("X1 invariant: consumer shards partition the partition space") {
    // the reference's work-steal scheduler guarantees no partition is
    // owned by two consumers and none is starved (reference
    // `…InputDStream.scala:235-264`); in the rebuild ownership IS the
    // shard predicate — assert the predicates are disjoint and complete
    // for every consumer count.
    val df = kafkaDf((0L until 32L).map(p => (p, p)))
    for (n <- 1 to 5) {
      val owned = (0 until n).map { id =>
        df.filter(KafkaShape.shardFilter(
            KafkaShape.StreamConfig(consumerId = id, consumersCount = n)))
          .select("partition").collect().map(_.getInt(0)).toSet
      }
      val all = owned.reduce(_ union _)
      assert(all == (0 until 32).toSet, s"n=$n: some partition starved")
      assert(owned.map(_.size).sum == 32,
        s"n=$n: a partition is owned twice")
    }
  }

  test("S9/M3 multi-topic rowkey parse: lag uses each topic's own head") {
    // two topics share partition ids but have different head offsets;
    // a partition-only join would lag every topic against the global
    // max head (the cross-topic inflation bug)
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("topic_a", 0, 10L), ("topic_a", 0, 50L),
      ("topic_b", 0, 500L), ("topic_b", 0, 900L))
    val kafka = rows.toDF("t", "p", "offset").select(
      lit(null).cast(BinaryType).as("key"),
      lit("x").cast(BinaryType).as("value"),
      col("t").as("topic"),
      col("p").cast(IntegerType).as("partition"),
      col("offset"),
      lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("timestamp"),
      lit(0).as("timestampType"))
    val commits = CommitLog.fromKafkaBatch(kafka,
        committedFilter = col("offset") < 600)
      .withColumn("rowkey", CommitLog.rowkey("graft"))
    val out = Monitoring.rowkeyParse(commits, kafka)
      .select("parsed_topic", "head_offset", "committed_offset", "lag")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("topic_a") == ((50L, 50L, 0L)))   // its OWN head, not 900
    assert(out("topic_b") == ((900L, 500L, 400L)))
  }
}
