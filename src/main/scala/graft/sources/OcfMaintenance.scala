package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Store maintenance for the graft-ocf record store — the operational
  * pair every log-structured store needs at scale:
  *
  *  - `describe`: the commit manifests as a DataFrame (file, count,
  *    offset/timestamp bounds, partitions) — the monitoring surface a
  *    broker exposes as head/log-start offsets, served without opening
  *    a single container.
  *  - `compact`: rewrite the store through its own source + sink. A
  *    micro-batch trigger cadence leaves a long-lived store as
  *    thousands of small containers (the classic small-files failure
  *    at 100 TB); one compaction pass re-reads and rewrites clustered
  *    by the Kafka partition column (the write's
  *    RequiresDistributionAndOrdering), and AQE coalescing merges the
  *    small inputs into few writer tasks. The existing overwrite
  *    commit protocol makes self-compaction safe: the new generation
  *    installs before the old one is retired, so a crash mid-compact
  *    leaves a readable store (old or new, never neither), and the
  *    fresh commit manifest restores stats-based pruning and keyed
  *    (shuffle-free) scans for the whole store.
  */
object OcfMaintenance {

  /** Manifest stats as a DataFrame; empty (correct-schema) frame for a
    * manifest-less store.
    */
  def describe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    OcfStore.manifestStats(dir, OcfStore.driverConf()).values.toSeq
      .map(st => (st.file, st.count, st.minOffset, st.maxOffset,
        st.minTsUs, st.maxTsUs, st.partitions.map(_.toLong)))
      .toDF("file", "count", "min_offset", "max_offset",
        "min_ts_us", "max_ts_us", "partitions")
  }

  /** Rewrite the store in place; returns (filesBefore, filesAfter).
    *
    * NOT safe under an active streaming reader: stream offsets are
    * per-file cursors keyed by container NAME, and compaction installs
    * a new generation under new names — a live cursor would see the
    * compacted containers as fresh files and replay the whole store.
    * Stop the stream, compact, restart (the restart replays nothing
    * only if its checkpoint is also reset — compaction is a
    * maintenance window operation, exactly as broker log compaction
    * is). Batch readers are unaffected: they plan against a single
    * listing, and the commit installs-new-before-retiring-old.
    */
  def compact(spark: SparkSession, dir: String): (Int, Int) = {
    def nFiles: Int =
      OcfStore.headCounts(dir, OcfStore.driverConf()).size
    val before = nFiles
    // read fully resolves its file list at planning; the overwrite
    // installs renamed temps only at driver commit, after every read
    // task has finished — same-dir rewrite is ordered, not racy
    spark.read.format("graft-ocf").load(dir)
      .write.format("graft-ocf").mode("overwrite").save(dir)
    (before, nFiles)
  }
}
