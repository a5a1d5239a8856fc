package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-to-item collaborative filtering over co-engagement — the
  * "customers who bought X also bought Y" pass (Amazon-style
  * item2item CF; Linden et al. 2003, public), which is also the
  * co-occurrence mining a training-data pipeline runs to build
  * retrieval candidates from behavioral logs.
  *
  * Scale shape: the quadratic step (pairs within one customer's
  * basket) is bounded BEFORE it happens — each basket is capped to
  * its `basketCap` smallest item ids (deterministic, via the
  * GroupedTopK bounded-heap exec, never a per-partition sort), so the
  * pair unfold is ≤ cap²·customers no matter how pathological one
  * buyer is; the hot-basket cap is the same discipline as minhash's
  * hot-bucket cap. Pair counts then rank by LIFT =
  * (c_ab·N)/(c_a·c_b) — the PMI-ratio trick from collocations: one
  * correctly-rounded division of exact BIGINTs, bit-stable in any
  * engine, no logs — and the final per-item top-k is again the
  * bounded-heap exec, O(items·k) out of the shuffle.
  */
object Recommend {

  /** engagement: (cust, item) rows (duplicates fine — deduped here).
    * Output: per item_a its top-`k` co-engaged item_b by lift desc
    * (ties → item_b asc), with counts, lift, and 1-based rank `rk`.
    * `minCount` floors the pair support BEFORE scoring — the same
    * hapax kill as collocations' minCount: a pair seen once is noise
    * to a recommender, and on sparse engagement the singleton tail is
    * ~all pairs, so the floor is what keeps the score/rank stages
    * sized by signal rather than by noise.
    */
  def copurchaseTopK(engagement: DataFrame, k: Int = 5,
                     basketCap: Int = 50, minCount: Long = 1L): DataFrame = {
    val distinctCp = engagement
      .select(col("cust"), col("item")).distinct()
    // four consumers read this frame (both pair sides, item counts,
    // customer count); eagerly materialize once and truncate lineage
    // so the dedup+cap subtree doesn't re-execute per consumer (the
    // componentMin pattern — on a cluster, checkpoint() is the
    // durable form). Bounded: ≤ basketCap rows per customer, two
    // narrow columns.
    val capped = graft.plans.GroupedTopK(distinctCp, Seq("cust"),
      Seq(("item", true)), k = basketCap, rankName = "__bc")
      .drop("__bc")
      .localCheckpoint()
    val itemCnt = capped.groupBy(col("item"))
      .agg(count(lit(1)).as("ci"))
    // one-row customer total attached through a single-bucket
    // BroadcastHashJoin (the collocations pattern — the key must be a
    // non-foldable expression of a real column; a literal pair would
    // constant-fold and degrade to a nested-loop join)
    val nCust = capped.select(col("cust")).distinct()
      .agg(count(lit(1)).as("n_cust"))
      .withColumn("__jk", pmod(xxhash64(col("n_cust")), lit(1L)))
    // count each unordered pair ONCE (a < b) — halves the aggregate's
    // shuffle volume — and mirror the (small) aggregated frame after,
    // since co-occurrence is symmetric and every item needs its own
    // top-k list
    val half = capped.select(col("cust"), col("item").as("item_a"))
      .join(capped.select(col("cust"), col("item").as("item_b")), "cust")
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCount)
    val pairs = half.unionAll(half.select(col("item_b").as("item_a"),
      col("item_a").as("item_b"), col("n_co")))
    // catalog-sized count frames broadcast (the collocations pattern)
    // — without the hint the checkpointed scan has no stats and both
    // joins fall back to sort-merge, sorting the pair frame twice
    val scored = pairs
      .join(broadcast(itemCnt
          .select(col("item").as("item_a"), col("ci").as("ca"))),
        "item_a")
      .join(broadcast(itemCnt
          .select(col("item").as("item_b"), col("ci").as("cb"))),
        "item_b")
      .withColumn("__jk", pmod(xxhash64(col("n_co")), lit(1L)))
      .join(broadcast(nCust), "__jk")
      .withColumn("lift",
        (col("n_co") * col("n_cust")).cast("double") /
          (col("ca") * col("cb")).cast("double"))
      .select(col("item_a"), col("item_b"), col("n_co"), col("lift"))
    graft.plans.GroupedTopK(scored, Seq("item_a"),
      Seq(("lift", false), ("item_b", true)), k = k, rankName = "rk")
  }

  /** NDCG@k of the TRAIN-popularity ranking against held-out
    * engagement — the graded ranking metric (public: Järvelin &
    * Kekäläinen 2002) every recommender evaluation starts from, at
    * its honest baseline: rank the k most train-popular items
    * (count desc, item asc — deterministic), score each eval
    * customer by DCG = Σ_{hit at rank r} 1/log₂(r+1) against
    * IDCG = the best-possible prefix for their eval-item count. A
    * model that can't beat popularity-NDCG isn't personalizing.
    *
    * Determinism: every discount 1/log₂(r+1) = DetLn(2)/DetLn(r+1) —
    * divisions of the libm-free series on small integers, bit-equal
    * cross-engine; DCG folds the customer's hit list in rank order,
    * IDCG is the ascending prefix fold (driver-precomputed literal
    * array, element_at by min(m, k)); NDCG is one division.
    * Shape: the top-k census is TakeOrdered + a k-row broadcast; per
    * customer everything is a bounded (≤ k) fold — no window, no
    * unbounded state. Output per eval customer:
    * (cust, n_eval_items, dcg, idcg, ndcg).
    */
  def ndcgPopularity(train: DataFrame, evalSet: DataFrame,
                     k: Int = 10): DataFrame = {
    import graft.functions.DetLnImpl
    val top = train.select(col("item")).groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(k)
      .collect().map(_.getLong(0))
    require(top.nonEmpty, "ndcgPopularity: empty train")
    val d = (1 to top.length)
      .map(r => DetLnImpl.eval(2L) / DetLnImpl.eval(r + 1L))
    val idcgPrefix = d.scanLeft(0.0)(_ + _).drop(1).toArray
    val s = train.sparkSession
    val topDf = s.createDataFrame(
      top.toSeq.zipWithIndex.map { case (it, i) =>
        (it, (i + 1).toLong, d(i))
      }).toDF("item", "r", "d")
    val evalPairs = evalSet.select(col("cust"), col("item")).distinct()
    val hits = evalPairs.join(broadcast(topDf), Seq("item"))
      .groupBy(col("cust"))
      .agg(sort_array(collect_list(struct(col("r"), col("d"))))
        .as("hs"))
      .select(col("cust"),
        aggregate(col("hs"), lit(0.0), (acc, x) =>
          acc + x.getField("d")).as("dcg"))
    evalPairs.groupBy(col("cust")).agg(count(lit(1)).as("m"))
      .join(hits, Seq("cust"), "left_outer")
      .withColumn("dcg", coalesce(col("dcg"), lit(0.0)))
      .withColumn("idcg", element_at(lit(idcgPrefix),
        least(col("m"), lit(top.length.toLong)).cast("int")))
      .select(col("cust"), col("m").as("n_eval_items"), col("dcg"),
        col("idcg"), (col("dcg") / col("idcg")).as("ndcg"))
  }
}
