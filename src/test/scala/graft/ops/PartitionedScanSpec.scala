package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables

/** Hive-style directory partitioning must prune at PLANNING time: an
  * equality filter on the partition column appears as a
  * PartitionFilter on the scan and only the matching directory's
  * files are read — data filters never see the other partitions.
  */
class PartitionedScanSpec extends SparkSuite {

  test("event_type filter prunes to one partition directory") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val dir = tmpDir("part_events")
    Tables.events(s, d)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = s.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"))
    q.collect()
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "equality on the partition column must become a PartitionFilter")
    // the pruned file listing holds exactly the purchase directory
    val dirs = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.getParent.getName)).distinct
    assert(dirs == Seq("event_type=purchase"), dirs.toString)
    // and the rows equal the flat-table filter
    val expect = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"))
      .collect().map(_.getLong(0)).toSet
    assert(q.collect().map(_.getLong(0)).toSet == expect)
  }
}
