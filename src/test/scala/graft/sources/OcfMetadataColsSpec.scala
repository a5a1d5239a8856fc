package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** DSv2 metadata columns `_container` / `_pos`: hidden unless
  * selected, exact per-file lineage (position dense from 0 per
  * container), correct under block-skip range slicing, and
  * composable with pruning and filters.
  */
class OcfMetadataColsSpec extends SparkSuite {

  private def kafkaDf(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"p_$i")).toDF("id", "props")
      .select(
        col("id").cast("string").cast("binary").as("key"),
        col("props").cast("binary").as("value"),
        lit("events").as("topic"),
        (col("id") % 4).cast("int").as("partition"),
        col("id").as("offset"),
        lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
        lit(0).as("timestampType"))
  }

  test("_container/_pos give exact per-file lineage and stay hidden " +
    "unless selected") {
    val dir = tmpDir("ocf_meta_cols")
    kafkaDf(400).write.format("graft-ocf").mode("overwrite").save(dir)
    val back = spark.read.format("graft-ocf").load(dir)
    // hidden by default
    assert(!back.columns.contains("_container"))
    val withMeta = back.select(col("offset"), col("_container"),
      col("_pos"))
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".ocf")).toSet
    val seen = withMeta.select("_container").distinct().collect()
      .map(_.getString(0)).toSet
    assert(seen == files, s"$seen vs $files")
    // _pos dense from 0 within each container
    val posOk = withMeta.groupBy(col("_container"))
      .agg(count(lit(1)).as("n"), min(col("_pos")).as("lo"),
        max(col("_pos")).as("hi"),
        countDistinct(col("_pos")).as("nd"))
      .collect()
    posOk.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1 &&
        r.getLong(4) == r.getLong(1), s"dense positions: $r")
    }
    // composes with filters (and the rows keep the right lineage)
    val one = withMeta.filter(col("offset") === 123L).collect()
    assert(one.length == 1 && one.head.getString(1).endsWith(".ocf"))
  }

  test("_pos respects block-skip range slices (minPartitions splits)") {
    val dir = tmpDir("ocf_meta_split")
    kafkaDf(1000).write.format("graft-ocf")
      .option("targetFiles", "1").mode("overwrite").save(dir)
    val got = spark.read.format("graft-ocf")
      .option("minPartitions", "8").load(dir)
      .select(col("offset"), col("_pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 1000)
    // one container written sorted by (partition, offset): _pos is a
    // permutation of 0..999 and each row's _pos is consistent across
    // the split boundaries (no reset per slice)
    assert(got.values.toSeq.sorted == (0L until 1000L))
  }
}
