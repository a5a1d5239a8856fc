package graft.queries

import graft.SparkSuite

/** Driver-contract sanity: every oracle references a registered query,
  * and every registered query builds an analyzable plan against the
  * smallest fixture (schema resolution errors surface here instead of
  * inside the driver's verify run).
  */
class RegistrySpec extends SparkSuite {

  test("every oracle key has a query") {
    val orphans = Queries.oracles.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query analyzes against sf0.001") {
    val d = "/root/testdata/sf0.001"
    val failures = Queries.all.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, d)
          assert(df.schema.fields.nonEmpty)
          None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("evaluation barriers survive optimization under count() pruning") {
    // r14: the first barrier (`xxhash64(*).isNotNull`) was constant-
    // folded by NullPropagation (xxhash64 is non-nullable) and the
    // bench silently went back to timing pruned skeletons. This pins
    // the current idiom: the barrier's hash must still be in the
    // OPTIMIZED plan of the count-shaped aggregate Bench executes.
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("url_canon", "approx_distinct")) {
      val opt = Queries.all(name)(spark, d).groupBy().count()
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("xxhash64"),
        s"$name: the evaluation barrier folded out of the optimized " +
          "plan — count() is timing a pruned skeleton again")
    }
  }

  test("every query has an oracle (no rows-only checks left)") {
    val noOracle = Queries.all.keySet -- Queries.oracles.keySet
    assert(noOracle.isEmpty,
      s"every query needs an oracle (ivf_topk's cell-materialization " +
        s"pattern covers driver-trained operators): $noOracle")
  }
}
