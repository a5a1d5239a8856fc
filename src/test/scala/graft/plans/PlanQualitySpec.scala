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

  /** The OTHER 100×-scale plan killer: a `Window` with no partitionBy
    * funnels every input row through ONE task (global sort + single
    * consumer). The allowlist pins the queries whose unpartitioned
    * frame is provably BOUNDED — pre-aggregated to value-domain or
    * type cardinality, never key/row count — each justified at its
    * definition site. A new query landing an unpartitioned window
    * must either bound its frame and join this list, or repartition.
    */
  private val boundedFrameAllowlist: Set[String] = Set(
    // frame over per-DAY-grain aggregates — calendar domain, not
    // user count (see the definition-site comment)
    "cumulative_users",
    // rank window over per-score-value groups (n_chars domain)
    "rank_auc",
    // rank window over spend VALUE groups (whole-dollar domain);
    // digit-share window over nine leading-digit groups
    "gini_spend", "benford_values", "spend_concentration",
    // rk stamp over an already-.limit(k) frame (TakeOrderedAndProject
    // upstream does the distributed top-k; the window sees k rows)
    "bm25_search", "text_index_store", "rag_chunk_search",
    // both PRF rounds are bm25TopK — each rk stamp over a .limit(k)
    // frame (feedback round and expanded round)
    "prf_search",
    // both arms' rk stamps + the fused rk, each over a .limit(poolK)
    // or .limit(k) frame (Retrieval.hybridTopK scaladoc)
    "hybrid_search",
    // rk stamp over an already-.limit(k) frame
    "late_interaction",
    // the global-bounds window runs over the one-row-per-event-type
    // frame (TimeSeries.interpolateGaps, the denseHourly shape)
    "interpolate_gaps",
    // water-filling over per-SOURCE token caps — source cardinality
    "mixture_plan",
    // largest-remainder ranks over the same SOURCE census
    // (CorpusOps.mixtureTemperature scaladoc)
    "mixture_temperature",
    // denseHourly's global-bounds window runs over the one-row-per-
    // event-type frame (TimeSeries.denseHourly scaladoc); ×2 when the
    // series self-joins
    "series_corr", "series_spearman", "cusum_changepoint",
    "series_acf", "seasonal_profile", "forecast_backtest",
    "arrival_dispersion", "seasonal_anomaly", "series_ess",
    "durbin_watson",
    // cumulative CDFs over the $5 value-BUCKET census (the gini_spend
    // bound; Eval.emdDrift scaladoc)
    "emd_drift",
    // sweep-line running sum over MINUTE-grain net deltas — at most
    // one row per minute of retention at any data volume
    // (Sessionize.peakConcurrency scaladoc)
    "peak_concurrency",
    // KS cumulative counts run over WHOLE-DOLLAR value groups —
    // value-domain cardinality, the gini_spend bound (Eval.ksTest
    // scaladoc)
    "ks_test",
    // SPRT's cumulative counts run over the DAY domain — calendar
    // cardinality (Eval.sprtLedger scaladoc)
    "sprt_ledger",
    // median rank-selection + run-boundary lag over the DAY census —
    // calendar cardinality (TimeSeries.runsTest scaladoc)
    "runs_test",
    // moving-range lag + global sums over the same DAY census
    // (TimeSeries.xmrChart scaladoc)
    "xmr_chart",
    // rank selection over the gap-DAY census (calendar-bounded;
    // session_gaps definition site)
    "session_gaps",
    // rank selection over the tenure-DAY census (same bound;
    // user_tenure definition site)
    "user_tenure",
    // census-offset ranking: cumulative window over per-score-value
    // groups (n_chars domain) + decile cum over 10 rows
    // (Eval.cumulativeGain scaladoc)
    "cumulative_gain",
    // three value-census cumulative windows, each bounded by the
    // metric's QUANTIZATION grid — calendar days / per-user counts /
    // whole-hundred-dollar buckets (Relational.rfmSegments scaladoc)
    "rfm_segments",
    // split-search cumulative windows over the value-BUCKET census
    // ($5 grid — value-domain, not row count; Eval.decisionStump
    // scaladoc)
    "decision_stump"
  )

  test("no registered query plans an unpartitioned window " +
      "(outside the pinned bounded-frame allowlist)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val d = "/root/testdata/sf0.001"
    val hits = Queries.all.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan: SparkPlan = fn(spark, d).queryExecution.sparkPlan
      val unpart = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
      }
      if (unpart.nonEmpty) Some(name -> unpart) else None
    }
    val offenders = hits.filterNot { case (n, _) => boundedFrameAllowlist(n) }
    // the allowlist must not go stale: every pinned name still plans
    // an unpartitioned window (else it should be removed from the pin)
    val stale = boundedFrameAllowlist -- hits.map(_._1).toSet
    assert(offenders.isEmpty,
      "unpartitioned Window outside allowlist:\n" + offenders.map {
        case (n, ws) => s"  $n: ${ws.mkString(", ")}"
      }.mkString("\n"))
    assert(stale.isEmpty,
      s"allowlist entries no longer planning unpartitioned windows " +
        s"(remove them): ${stale.mkString(", ")}")
  }
}
