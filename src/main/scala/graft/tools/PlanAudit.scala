package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: scan every registered query's physical plan for
  * scale-smells — nested-loop/cartesian joins where a hash join should
  * be, and scans that read all columns. Prints one line per query.
  *
  * r14: also runs [[graft.plans.PlanChecks]] over the OPTIMIZED
  * logical plan — degenerate (constant-key) equi joins must carry a
  * structural bound on one side, and explicit broadcast hints must
  * not cover a raw fact-table scan. The r13 margin_mine shape
  * (constant-key join of two unbounded label halves) passed the
  * text greps ("bnlj=0 cart=0") and is exactly what these catch;
  * close-gate rule: zero FLAG lines over the whole registry.
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
    var flags = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val degAll = graft.plans.PlanChecks.degenerateJoins(df)
        val degBad = degAll.filterNot(_.bounded)
        val bcast = graft.plans.PlanChecks.unboundedBroadcastHints(df)
        degBad.foreach { d =>
          flags += 1; println(s"FLAG DEGEN $name $d")
        }
        bcast.foreach { t =>
          flags += 1; println(s"FLAG BCAST $name raw fact scan '$t' under broadcast hint")
        }
        val plan = df.queryExecution.executedPlan.toString()
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
          f"exchanges=$exch degen=${degAll.size} " +
          f"degenUnbounded=${degBad.size} bcastFact=${bcast.size}")
      } catch {
        case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage}")
      }
    }
    println(s"AUDIT-SUMMARY flags=$flags")
    spark.stop()
  }
}
