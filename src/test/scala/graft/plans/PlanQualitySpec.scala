package graft.plans

import graft.SparkSuite
import graft.queries.Queries

/** Plan-quality gate, enforced by `sbt test` rather than the manual
  * PlanAudit tool: no registered query may plan a nested-loop or
  * cartesian join — the two shapes that turn a 100 TB run into a
  * cross product. The brute-force similarity baselines pass because
  * their non-equi predicate lives in a post-join filter, leaving a
  * single-bucket BroadcastHashJoin (see Similarity scaladoc).
  */
class PlanQualitySpec extends SparkSuite {

  test("no registered query plans a nested-loop or cartesian join") {
    val d = "/root/testdata/sf0.001"
    val offenders = Queries.all.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, d).queryExecution.executedPlan.toString()
        val bnlj = plan.linesIterator
          .count(_.contains("BroadcastNestedLoopJoin"))
        val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
        if (bnlj + cart > 0) Some(s"$name: bnlj=$bnlj cart=$cart") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
