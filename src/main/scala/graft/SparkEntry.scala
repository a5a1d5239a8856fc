package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.engine.{KafkaShape, Tables}
import graft.ops.StreamOps
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The rebuild of the reference's one shipped analytical query: Kafka
    * record decode → tokenize → sliding-window word count (reference
    * `examples/.../KafkaWordCount.scala:67-72`).
    *
    * Slide = 2 minutes, not seconds: Spark plans a sliding window as an
    * Expand with (window/slide) projections per row, so a 2-second
    * slide meant 300 copies of every event before the aggregate — and
    * a generated switch too large for janino, silently dropping the
    * whole stage out of codegen.
    */
  def entry(spark: SparkSession): DataFrame =
    StreamOps.wordCountWindow(
      KafkaShape.decodeUtf8(
        KafkaShape.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))),
      "10 minutes", Some("2 minutes"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
