package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: scan every registered query's physical plan for
  * scale-smells — nested-loop/cartesian joins where a hash join should
  * be, and scans that read all columns. Prints one line per query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
        val bnlj =
          plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
        val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
        val smj = plan.linesIterator.count(_.contains("SortMergeJoin")) +
          plan.linesIterator.count(_.contains("ShuffledHashJoin"))
        val pushed = plan.linesIterator
          .count(l => l.contains("PushedFilters: [") &&
            !l.contains("PushedFilters: []"))
        val topk = plan.linesIterator.count(_.contains("GroupedTopK ["))
        // the shuffle budget: real shuffles only — a ReusedExchange is
        // the optimizer sharing one shuffle between consumers (free),
        // and a BroadcastExchange moves only the small side (not a
        // shuffle of the big table), so neither counts
        val exch = plan.linesIterator.count(l =>
          l.contains("Exchange ") && !l.contains("ReusedExchange") &&
            !l.contains("BroadcastExchange"))
        println(f"AUDIT $name%-22s bnlj=$bnlj cart=$cart bhj=$bhj " +
          f"shuffleJoin=$smj pushedScans=$pushed groupedTopK=$topk " +
          f"exchanges=$exch")
      } catch {
        case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
