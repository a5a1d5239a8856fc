package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The SQL surface of the graft-ocf store: a user who lives in
  * `spark.sql` — CREATE TABLE ... USING, INSERT INTO, SELECT with
  * pushed predicates — gets the same connector (scan pruning, commit
  * protocol) as the DataFrame API, because DataSourceV2 resolves the
  * same TableProvider through the session catalog.
  */
class OcfSqlDdlSpec extends SparkSuite {

  test("CREATE TABLE USING graft-ocf + INSERT INTO + SELECT round-trips") {
    val dir = tmpDir("ocf_sql_ddl")
    spark.sql("DROP TABLE IF EXISTS events_store")
    spark.sql(
      s"""CREATE TABLE events_store
         |USING `graft-ocf`
         |OPTIONS (path '$dir')""".stripMargin)
    try {
      val s = spark
      import s.implicits._
      (0 until 60).map(i => (i.toLong, s"payload_$i"))
        .toDF("id", "props")
        .select(
          col("id").cast("string").cast("binary").as("key"),
          col("props").cast("binary").as("value"),
          lit("events").as("topic"),
          (col("id") % 3).cast("int").as("partition"),
          col("id").as("offset"),
          lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
          lit(0).as("timestampType"))
        .createOrReplaceTempView("incoming")
      spark.sql("INSERT INTO events_store SELECT * FROM incoming")
      val n = spark.sql(
        "SELECT count(*) FROM events_store").collect().head.getLong(0)
      assert(n == 60)
      val byPart = spark.sql(
        """SELECT partition, count(*) AS n FROM events_store
          |WHERE partition = 1 GROUP BY partition""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(byPart == Set((1, 20)))
      // the SQL path went through the same connector: containers +
      // manifest on disk, decodable payloads
      val files = new java.io.File(dir).listFiles().map(_.getName)
      assert(files.exists(_.endsWith(".ocf")))
      assert(files.exists(_.startsWith("_manifest-")))
      val v = spark.sql(
        """SELECT CAST(value AS STRING) AS v FROM events_store
          |WHERE offset = 7""".stripMargin).collect().head.getString(0)
      assert(v == "payload_7")
    } finally spark.sql("DROP TABLE IF EXISTS events_store")
  }

  test("CALL graft.system.* drives the maintenance suite from SQL") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    val dir = tmpDir("ocf_call")
    // a many-container store: one commit per 20-row slice
    for (i <- 0 until 5)
      (i * 20 until (i + 1) * 20).map(j => (j.toLong, s"p_$j"))
        .toDF("id", "props")
        .select(col("id").cast("string").cast("binary").as("key"),
          col("props").cast("binary").as("value"),
          lit("events").as("topic"),
          (col("id") % 4).cast("int").as("partition"),
          col("id").as("offset"),
          lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
          lit(0).cast("int").as("timestampType"))
        .write.format("graft-ocf")
        .mode(if (i == 0) "overwrite" else "append").save(dir)

    // advise returns the triage table (bloomless store -> key_bloom row)
    val advice = s.sql(s"CALL graft.system.advise(dir => '$dir')")
      .collect().map(_.getString(0)).toSet
    assert(advice.contains("key_bloom"), s"got $advice")

    // vacuum: plant aged debris, CALL collects it
    val f = new java.io.File(dir, ".part-dead-0-1.ocf.tmp")
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2))
    assert(f.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000))
    val vac = s.sql(s"CALL graft.system.vacuum(dir => '$dir')").head()
    assert(vac.getInt(0) == 1 && vac.getLong(1) == 2L)
    assert(!f.exists())

    // compact: 5 containers -> fewer; rows survive
    val before = s.read.format("graft-ocf").load(dir).count()
    val comp = s.sql(s"CALL graft.system.compact(dir => '$dir')").head()
    assert(comp.getInt(0) == 5 && comp.getInt(1) < 5, s"got $comp")
    assert(s.read.format("graft-ocf").load(dir).count() == before)

    // defaulted parameter: zorder without target_files/ts_bucket_us
    val z = s.sql(s"CALL graft.system.zorder(dir => '$dir')").head()
    assert(z.getInt(1) == 8, s"got $z")
    assert(s.read.format("graft-ocf").load(dir).count() == before)

    // erase_keys: the GDPR pass from SQL — predicate over the key
    val er = s.sql(s"CALL graft.system.erase_keys(dir => '$dir', " +
      "predicate => 'CAST(key AS STRING) = CAST(7 AS STRING)')").head()
    assert(er.getLong(0) == before && er.getLong(1) == before - 1,
      s"got $er")
    assert(s.read.format("graft-ocf").load(dir)
      .filter(col("key").cast("string") === "7").count() == 0L)

    // unknown procedure fails cleanly
    intercept[Exception] {
      s.sql(s"CALL graft.system.nope(dir => '$dir')").collect()
    }

    // snapshots census: one row per commit-time snapshot, container
    // counts reflecting each generation (the Iceberg snapshots-table
    // role), ordered oldest-first
    val snaps = s.sql(s"CALL graft.system.snapshots(dir => '$dir')")
      .collect()
    assert(snaps.length >= 3,
      s"appends + compact + zorder each logged a snapshot: " +
        s"${snaps.length}")
    assert(snaps.map(_.getLong(0)).toSeq ==
      snaps.map(_.getLong(0)).toSeq.sorted, "oldest first")
    assert(snaps.last.getInt(2) > 0, "current snapshot has containers")
  }

  test("CALL graft.system.changes is the metadata-only CDF census: " +
      "the window's containers with their manifest record counts") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("ocf_sql_cdf")
    def feed(from: Int, until: Int) =
      (from until until).map(i => (i.toLong, s"p_$i")).toDF("id", "props")
        .select(col("id").cast("string").cast("binary").as("key"),
          col("props").cast("binary").as("value"),
          lit("events").as("topic"),
          (col("id") % 3).cast("int").as("partition"),
          col("id").as("offset"),
          lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
          lit(0).as("timestampType"))
    feed(0, 40).write.format("graft-ocf").mode("overwrite").save(dir)
    val t1 = System.currentTimeMillis()
    Thread.sleep(25)
    feed(40, 55).write.format("graft-ocf").mode("append").save(dir)
    val t2 = System.currentTimeMillis()
    val census = s.sql(s"CALL graft.system.changes(dir => '$dir', " +
      s"from_ms => ${t1}L, to_ms => ${t2}L)").collect()
    assert(census.nonEmpty)
    assert(census.map(_.getLong(1)).sum == 15L,
      "the window's manifest counts sum to the second write's records")
    // and the census names exactly what changes() would read
    val read = OcfMaintenance.changes(s, dir, t1, t2)
    assert(read.count() == 15L)
  }
}
