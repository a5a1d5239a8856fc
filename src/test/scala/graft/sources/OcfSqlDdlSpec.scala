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
}
