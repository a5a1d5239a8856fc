package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import graft.SparkEntry

/** Plan-artifact dumper for the optimization rounds: writes
  * `explain("formatted")` of named registry queries to
  * `plans/<tag>/<query>_<suffix>.txt` so before/after plan claims in
  * OPTIMIZATION notes are checkable without running Spark.
  *
  * Usage: PlanSnap <tag> <suffix> <query> [query ...]
  * e.g.   PlanSnap r14 before decontaminate decontaminate_bloom
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <query>...")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("plans", tag)
    Files.createDirectories(dir)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plansnap] wrote ${dir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
