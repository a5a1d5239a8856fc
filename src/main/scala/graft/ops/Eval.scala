package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-evaluation metrics computed exactly at corpus scale — the
  * missing member next to the recall gates (Similarity), confusion
  * matrix (langid_confusion), and drift tests (drift_chi2): does a
  * SCORE actually rank a LABEL?
  */
object Eval {

  /** Contingency-lift table between two categorical columns — the
    * log-free PMI audit ("which feature values carry signal about the
    * target"): per observed (x, y) cell, the joint and marginal counts
    * and lift = P(x,y) / (P(x)·P(y)) = (n_xy·n) / (n_x·n_y). PMI is
    * ln(lift), a monotone map, so ranking/thresholding cells by lift
    * IS ranking by PMI — with every number either an exact BIGINT or
    * ONE division of exact BIGINTs (bit-identical across engines; the
    * same log-free discipline as the BM25 surrogate and
    * session_assoc's lift).
    *
    * Shape: one hash aggregate to cells (vocabulary² bound, not row
    * bound), marginals re-aggregated FROM the cell frame (no second
    * corpus pass) and broadcast back — cells, not rows, flow through
    * every join. The grand total is one more fold over the x-marginal
    * frame, carried as a column (no driver round-trip).
    */
  def contingencyLift(df: DataFrame, xCol: String, yCol: String)
      : DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n_xy"))
    val cp = cells.persist(org.apache.spark.storage.StorageLevel
      .MEMORY_AND_DISK)
    val xm = cp.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val ym = cp.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    // one-row grand total through a single-bucket BroadcastHashJoin
    // (the bigramLm idiom: key must be non-foldable or the join
    // degrades to nested-loop)
    val n = xm.agg(sum(col("n_x")).as("n"))
      .withColumn("__jk", pmod(xxhash64(col("n")), lit(1L)))
    cp.join(broadcast(xm), Seq("x"))
      .join(broadcast(ym), Seq("y"))
      .withColumn("__jk", pmod(xxhash64(col("n_xy")), lit(1L)))
      .join(broadcast(n), Seq("__jk"))
      .select(col("x").as(xCol), col("y").as(yCol),
        col("n_xy"), col("n_x"), col("n_y"), col("n"),
        ((col("n_xy") * col("n")).cast(DoubleType) /
          (col("n_x") * col("n_y")).cast(DoubleType)).as("lift"))
  }

  /** Exact Gini coefficient of a non-negative integer quantity over
    * its VALUE GROUPS — the inequality/concentration audit ("does 1%
    * of users drive 99% of spend") beside k_anonymity's census and
    * rank_auc's ranking power. Same rank-sum discipline as
    * [[rankAuc]]: one hash aggregate collapses rows to value groups,
    * ranks run over the collapsed frame (bounded by the quantity's
    * VALUE DOMAIN — quantize first if the quantity is near-unique per
    * row; the registry row uses whole currency units), and with
    * 2·Σᵢ i·x₍ᵢ₎ = Σ_v x_v·n_v·(2·endRank_v − n_v + 1):
    *   G = (Σ_v x_v·n_v·mid2_v − (N+1)·T) / (N·T),  T = Σ x —
    * exact integers (DECIMAL(38,0) product sums, the ab_welch
    * envelope) until ONE final division.
    */
  def giniGrouped(df: DataFrame, valueCol: String): DataFrame = {
    val groups = df
      .select(col(valueCol).cast(LongType).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    groups
      .withColumn("endRank", sum(col("n")).over(w))
      .withColumn("mid2", col("endRank") * 2L - col("n") + 1L)
      .agg(
        sum(col("x").cast(DecimalType(38, 0)) * col("n") * col("mid2"))
          .as("s2"),
        sum(col("x") * col("n")).as("t"),
        sum(col("n")).as("n_rows"))
      .where(col("t") > 0L)
      .select(col("n_rows"), col("t").as("total"),
        ((col("s2") - (col("n_rows") + 1L).cast(DecimalType(38, 0)) *
          col("t")).cast(DoubleType) /
          (col("n_rows").cast(DecimalType(38, 0)) * col("t"))
            .cast(DoubleType)).as("gini"))
  }

  /** Concentration-curve points beside [[giniGrouped]]: the share of
    * total quantity held by the top p% of rows, for each requested
    * percentage — "the top 1% of users drive X% of spend", EXACT even
    * when the p% boundary lands inside a tie group: the boundary
    * group's quantity is apportioned by integer count
    * (full groups above + (m − cumN_before)·x at the boundary), so
    * every published share is one division of exact BIGINTs.
    * m = ⌈N·p/100⌉ via integer ceil. Same value-group discipline as
    * giniGrouped: the descending cumulative window runs over the
    * quantity's VALUE DOMAIN, and the per-percentile pick is one join
    * of the group frame against a literal percentage array.
    */
  def concentration(df: DataFrame, valueCol: String,
                    pcts: Seq[Int] = Seq(1, 10, 50)): DataFrame = {
    val groups = df
      .select(col(valueCol).cast(LongType).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cum = groups
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_s", sum(col("x") * col("n")).over(w))
      .withColumn("n_rows", sum(col("n")).over(all))
      .withColumn("total", sum(col("x") * col("n")).over(all))
    cum
      .select(col("x"), col("n"), col("cum_n"), col("cum_s"),
        col("n_rows"), col("total"),
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct"))
      .withColumn("m", expr("CAST((n_rows * pct + 99) div 100 AS BIGINT)"))
      // the boundary group: the first (descending) group covering m
      .where(col("total") > 0L && col("cum_n") - col("n") < col("m") &&
        col("m") <= col("cum_n"))
      .withColumn("top_units",
        col("cum_s") - col("x") * (col("cum_n") - col("m")))
      .select(col("pct"), col("m").as("n_top"), col("top_units"),
        col("total"),
        (col("top_units").cast(DoubleType) /
          col("total").cast(DoubleType)).as("share"))
  }

  /** Benford first-significant-digit audit of a positive quantity —
    * the fabricated-data / unit-mix smoke alarm of a data-quality
    * gate: observed count and share per leading digit against the
    * Benford expectation log₁₀(1+1/d), which enters BOTH engines as
    * the same nine LITERALS (never computed — the log-free oracle
    * discipline). share and deviation are one division / one
    * subtraction of exact integers and literals.
    */
  def benfordAudit(df: DataFrame, cents: org.apache.spark.sql.Column)
      : DataFrame = {
    val digits = df
      .select(cents.cast(LongType).as("c"))
      .where(col("c") > 0L)
      .select(substring(col("c").cast(StringType), 1, 1)
        .cast(LongType).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val benford = map(
      (1 to 9).flatMap(d => Seq(lit(d.toLong),
        lit(BenfordP(d - 1)))): _*)
    digits
      .withColumn("n_total", sum(col("n")).over(total))
      .select(col("digit"), col("n"),
        (col("n").cast(DoubleType) / col("n_total").cast(DoubleType))
          .as("share"),
        element_at(benford, col("digit")).as("benford_p"))
      .withColumn("dev", col("share") - col("benford_p"))
  }

  /** log₁₀(1 + 1/d) for d = 1..9, as fixed literals (shared with the
    * oracle SQL so no engine ever computes a log).
    */
  val BenfordP: Array[Double] = Array(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /** Exact Mann-Whitney AUC of an integer score against a binary
    * label: P(score_pos > score_neg) + ½·P(tie), via the rank-sum
    * identity with midrank tie handling — the textbook AUC, not a
    * sampled or binned estimate.
    *
    * Shape: one hash aggregate collapses rows to SCORE GROUPS
    * (n, n_pos per distinct score), and the rank arithmetic runs on
    * that collapsed frame — an unpartitioned window, but over groups,
    * not rows, so it is bounded by score cardinality: for a
    * bounded-range integer score (length, cents, quantized model
    * score) that is thousands of rows regardless of corpus size. For
    * a high-cardinality score, quantize first — binned AUC is the
    * standard practice at that point anyway. All ranks are folded at
    * 2× scale so midranks (the .5s) stay in BIGINT: with
    * 2·midrank = first_rank + last_rank per group,
    * AUC = (Σ_pos 2·midrank − n_pos·(n_pos+1)) / (2·n_pos·n_neg)
    * — exact integers until the single final division.
    */
  def rankAuc(df: DataFrame, scoreCol: String,
              isPos: org.apache.spark.sql.Column): DataFrame = {
    val groups = df
      .select(col(scoreCol).cast(LongType).as("s"),
        when(isPos, 1L).otherwise(0L).as("p"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("np"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    groups
      .withColumn("endRank", sum(col("n")).over(w))
      // 2·midrank = start + end = (end − n + 1) + end
      .withColumn("mid2", col("endRank") * 2L - col("n") + 1L)
      .agg(sum(col("np") * col("mid2")).as("sum2r"),
        sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"))
      .where(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(col("n_pos"), col("n_neg"),
        ((col("sum2r") - col("n_pos") * (col("n_pos") + 1L))
          .cast(DoubleType) /
          (col("n_pos") * col("n_neg") * 2L).cast(DoubleType))
          .as("auc"))
  }

  /** Welch's two-sample t² per group — the A/B experiment readout
    * next to [[rankAuc]] (rank-based) and drift_chi2 (categorical):
    * does arm B's mean target differ from arm A's, variance NOT
    * assumed equal (the unequal-variance Welch form every experiment
    * platform defaults to). Emitting t² instead of t keeps the
    * statistic square-root-free; the caller compares against the
    * squared critical value (t² > 3.84 ≈ two-sided p < .05 at large
    * df).
    *
    * Exact-integer form: per (group, arm) one hash aggregate folds
    * n, Σc, Σc² in BIGINT; every derived quantity is integer
    * arithmetic in DECIMAL(38,0) — with A = s₁n₂ − s₂n₁ and
    * SSᵢ = nᵢqᵢ − sᵢ², t² = A²·(n₁−1)(n₂−1) /
    * (SS₁·n₂²(n₂−1) + SS₂·n₁²(n₁−1)) — and the published doubles are
    * one multiply + one divide of those exact decimals in fixed
    * order, bit-identical cross-engine. Magnitude envelope: safe to
    * ~10⁷ rows × 10⁵ cents per (group, arm) (A² ≲ 10³⁴ < 10³⁸);
    * beyond that, pre-scale cents (the statistic is scale-invariant).
    *
    * Shape: ONE map-side-combinable aggregate over (group, arm) then
    * a group-cardinality pivot — no self-join, no window, nothing
    * keyed by row count.
    */
  def welchTTest(df: DataFrame, groupCol: String, armCol: String,
                 valueCents: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val perArm = df
      .select(col(groupCol), col(armCol).cast(LongType).as("__arm"),
        valueCents.as("__c"))
      .groupBy(col(groupCol), col("__arm"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("s"),
        sum(col("__c") * col("__c")).as("q"))
    val wide = perArm.groupBy(col(groupCol))
      .agg(
        max(when(col("__arm") === 0L, col("n"))).as("n1"),
        max(when(col("__arm") === 0L, col("s"))).as("s1"),
        max(when(col("__arm") === 0L, col("q"))).as("q1"),
        max(when(col("__arm") === 1L, col("n"))).as("n2"),
        max(when(col("__arm") === 1L, col("s"))).as("s2"),
        max(when(col("__arm") === 1L, col("q"))).as("q2"))
      .where(col("n1") > 1L && col("n2") > 1L)
    val a = col("s1").cast(dec) * col("n2") -
      col("s2").cast(dec) * col("n1")
    val ss1 = col("n1").cast(dec) * col("q1") -
      col("s1").cast(dec) * col("s1")
    val ss2 = col("n2").cast(dec) * col("q2") -
      col("s2").cast(dec) * col("s2")
    val den = ss1 * (col("n2").cast(dec) * col("n2") * (col("n2") - 1L)) +
      ss2 * (col("n1").cast(dec) * col("n1") * (col("n1") - 1L))
    wide
      .withColumn("__a", a)
      .withColumn("__den", den)
      .where(col("__den") > 0)
      .select(col(groupCol), col("n1").as("n_a"), col("n2").as("n_b"),
        (col("__a").cast(DoubleType) /
          (col("n1").cast(dec) * col("n2")).cast(DoubleType))
          .as("mean_diff_cents"),
        ((col("__a") * col("__a")).cast(DoubleType) *
          ((col("n1") - 1L).cast(dec) * (col("n2") - 1L))
            .cast(DoubleType) /
          col("__den").cast(DoubleType)).as("t2"))
  }

  /** Reliability-diagram bins for an integer classifier score against
    * a binary label — the calibration readout beside [[rankAuc]]
    * (ranking) and [[welchTTest]] (means): per equi-width score bin,
    * the mean score vs the observed positive rate; a calibrated
    * scorer tracks the diagonal. Equi-width bin edges come from a
    * driver-side (min, max) census — two longs, the skew_report
    * metadata pattern (the score pass itself is a pure map; the
    * census is a second scan of the score column only, the standard
    * two-pass equi-width histogram). bin = (s − lo)·nBins div width
    * with s ≥ lo, so truncating div IS floor. Exact BIGINT sums; two
    * one-division doubles per bin.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, isPos: Column,
                      nBins: Int = 10): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val rows = df.select(col(scoreCol).cast(LongType).as("s"),
      when(isPos, 1L).otherwise(0L).as("y"))
    val head = rows.agg(min(col("s")), max(col("s"))).head
    val (lo, width) =
      if (head.isNullAt(0)) (0L, 1L)
      else (head.getLong(0), head.getLong(1) - head.getLong(0) + 1L)
    rows
      .select(expr(s"((s - ${lo}L) * ${nBins}L) div ${width}L")
        .as("bin"), col("s"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("__ss"),
        sum(col("y")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("__ss").cast(DoubleType) / col("n").cast(DoubleType))
          .as("mean_score"),
        (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
          .as("pos_rate"))
  }

  /** Isotonic calibration over [[calibrationBins]]'s deciles — the
    * PAV fit (public: pool-adjacent-violators, Ayer et al. 1955;
    * standard probability calibration since Zadrozny & Elkan 2002)
    * computed by the MINIMAX identity rather than the sequential
    * pooling loop: iso(i) = max_{j≤i} min_{k≥i} mean(y over bins
    * j..k). The identity makes the fit expressible as pure
    * comparisons over interval means — each mean is ONE double
    * division of exact integer prefix sums, and min/max are
    * order-independent, so the fit hash-compares bitwise with no
    * written-down fold at all (stronger than the KM/logRank envelope).
    *
    * Shape: the data-sized work is calibrationBins' single hash
    * aggregate; the O(nBins³) minimax runs on the driver over the
    * ≤ nBins collected bins (a bounded artifact, like the bootstrap's
    * B resamples — never data-sized). Output per present bin:
    * (bin, n, n_pos, pos_rate, iso_rate) with iso_rate monotone
    * non-decreasing in bin.
    */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
                          isPos: Column, nBins: Int = 10): DataFrame = {
    val rows = calibrationBins(df, scoreCol, isPos, nBins)
      .select(col("bin"), col("n"), col("n_pos"))
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val k = rows.length
    val pn = rows.scanLeft(0L)(_ + _._2)
    val pp = rows.scanLeft(0L)(_ + _._3)
    def mean(j: Int, kk: Int): Double =
      (pp(kk + 1) - pp(j)).toDouble / (pn(kk + 1) - pn(j)).toDouble
    val iso = (0 until k).map { i =>
      var best = Double.NegativeInfinity
      var j = 0
      while (j <= i) {
        var mn = Double.PositiveInfinity
        var kk = i
        while (kk < k) {
          val m = mean(j, kk)
          if (m < mn) mn = m
          kk += 1
        }
        if (mn > best) best = mn
        j += 1
      }
      best
    }
    df.sparkSession.createDataFrame(
      rows.toSeq.zipWithIndex.map { case ((bin, n, np), i) =>
        (bin, n, np, np.toDouble / n.toDouble, iso(i))
      })
      .toDF("bin", "n", "n_pos", "pos_rate", "iso_rate")
  }

  /** Poisson-bootstrap confidence interval for the per-group mean —
    * uncertainty quantification that scales (public: the Poisson
    * bootstrap, Hanley & MacGibbon / Chamandy et al.; each row joins
    * resample r with a Poisson(1) multiplicity, so no resample ever
    * materializes and the whole thing is one ×B map into a partial
    * aggregate — the only way to bootstrap 10^11 rows). Weights are
    * DETERMINISTIC: the train_shards 31-bit-folded Knuth hash of
    * (id·B + r) scaled to 2^32, cut at the Poisson(1) CDF thresholds
    * (⌊F(k)·2^32⌋ for k = 0..3, multiplicity capped at 4 — tail mass
    * 0.4%), so every engine replays the exact same resamples.
    *
    * Output per group: the full-sample mean plus the [≈p05, ≈p95]
    * interval of the B resample means — rank-SELECTED elements
    * (loRank = ⌈0.05·B⌉, hiRank = B+1−loRank over the non-empty
    * resamples), never an interpolation, so the doubles are selected
    * one-division values, bit-stable. The rank window partitions by
    * group and sees B rows — bounded by the resample count, never by
    * data.
    */
  def bootstrapCi(df: DataFrame, groupCol: String, idCol: String,
                  valueCents: Column, b: Int = 32): DataFrame = {
    require(b >= 20, "need >= 20 resamples for a p05/p95 selection")
    // Poisson(1) CDF at k = 0..3, scaled to 2^32 (exact literals so
    // the oracle replays them verbatim)
    val t = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L)
    val rows = df.select(col(groupCol),
      col(idCol).cast(LongType).as("__id"), valueCents.as("__c"))
    val weighted = rows
      .select(col(groupCol), col("__id"), col("__c"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .withColumn("__x", col("__id") * lit(b.toLong) + col("rep"))
      .withColumn("__b31",
        expr("(__x % 2147483648L + __x div 2147483648L) % 2147483648L"))
      .withColumn("__u",
        pmod(col("__b31") * lit(2654435761L), lit(4294967296L)))
      .withColumn("__w",
        t.map(th => (col("__u") >= th).cast(LongType)).reduce(_ + _))
    val perRep = weighted.groupBy(col(groupCol), col("rep"))
      .agg(sum(col("__w") * col("__c")).as("__swc"),
        sum(col("__w")).as("__sw"))
      .where(col("__sw") > 0L)
      .select(col(groupCol), col("rep"),
        (col("__swc").cast(DoubleType) / col("__sw").cast(DoubleType))
          .as("__m"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__m"), col("rep"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val sel = perRep
      .withColumn("__rn", row_number().over(wOrd).cast(LongType))
      .withColumn("__cnt", count(lit(1)).over(wAll))
      .withColumn("__loRank", expr("(__cnt + 19) div 20L"))
      .groupBy(col(groupCol))
      .agg(max(col("__cnt")).as("n_resamples"),
        max(when(col("__rn") === col("__loRank"), col("__m")))
          .as("ci_lo_cents"),
        max(when(col("__rn") === col("__cnt") + 1L - col("__loRank"),
          col("__m"))).as("ci_hi_cents"))
    val full = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__c")).as("__sc"))
      .select(col(groupCol), col("n_events"),
        (col("__sc").cast(DoubleType) / col("n_events").cast(DoubleType))
          .as("mean_cents"))
    full.join(sel, Seq(groupCol))
  }

  /** Kaplan–Meier survival curve over (duration, event) pairs — THE
    * churn/retention estimator (public: Kaplan & Meier 1958):
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times tᵢ with
    * dᵢ events and nᵢ subjects still at risk; censored subjects leave
    * the risk set without contributing an event. Reported per
    * distinct duration that has ≥1 EVENT (the standard step points):
    * (t, n_risk, n_events, surv).
    *
    * Shape: one per-duration census (two conditional counts) — the
    * duration DOMAIN bounds it (day-grain: ≤ observation-span rows,
    * the peak_concurrency argument), so the census is a driver read
    * and the sequential product folds there in ascending-t order
    * (ONE written-down IEEE sequence: acc · (1 − d/n), each d/n a
    * single double division — replayed verbatim by the oracle's
    * ordered list_reduce). No window, no shuffle beyond the census
    * aggregate; the result frame is census-sized literals.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val census = df
      .select(col(durationCol).cast(LongType).as("t"),
        col(eventCol).cast(BooleanType).as("e"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("e"), 1L).otherwise(0L)).as("d"))
      .orderBy(col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = census.iterator.map(_._2).sum
    var atRisk = total
    var surv = 1.0
    val out = Seq.newBuilder[(Long, Long, Long, Double)]
    census.foreach { case (t, nAt, d) =>
      if (d > 0) {
        surv = surv * (1.0 - d.toDouble / atRisk.toDouble)
        out += ((t, atRisk, d, surv))
      }
      atRisk -= nAt // events and censorings both leave the risk set
    }
    df.sparkSession.createDataFrame(out.result())
      .toDF("t", "n_risk", "n_events", "surv")
  }

  /** One-way ANOVA F statistic — "does the group factor move the
    * metric at all" (the day-of-week / cohort / variant screen run
    * before any pairwise test): F = (SSB/(k−1)) / (SSW/(N−k)) from
    * the exact per-group moments. Execution: one hash aggregate to
    * the k groups (exact DECIMAL n, Σ, Σ²), then the ≤ k rows fold on
    * the driver in group order — each per-group term s_g²/n_g is ONE
    * division of exact integers, SSB/SSW/F are the written-down
    * combination, all replayed by the oracle's ordered list_reduce.
    * Output: one row (k, n, ssb, ssw, f_stat).
    */
  def anovaF(df: DataFrame, groupCol: Column, valueCents: Column)
      : DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.select(groupCol.cast(LongType).as("g"),
        valueCents.as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("c").cast(dec)).as("s"),
        sum(col("c").cast(dec) * col("c")).as("q"))
      .orderBy(col("g"))
      .collect()
      .map(r => (r.getLong(1), r.getDecimal(2), r.getDecimal(3)))
    val k = rows.length
    require(k > 1, "anovaF: need at least two groups")
    val n = rows.iterator.map(_._1).sum
    require(n > k, "anovaF: need residual degrees of freedom")
    val sTot = rows.iterator.map(x => BigDecimal(x._2)).sum
    val qTot = rows.iterator.map(x => BigDecimal(x._3)).sum
    var t1 = 0.0
    rows.foreach { case (ng, sg, _) =>
      val sb = BigDecimal(sg)
      t1 += ((sb * sb).toDouble / ng.toDouble)
    }
    val sst2 = (sTot * sTot).toDouble / n.toDouble
    val ssb = t1 - sst2
    val ssw = qTot.toDouble - t1
    val f = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    df.sparkSession
      .createDataFrame(Seq((k.toLong, n, ssb, ssw, f)))
      .toDF("k", "n", "ssb", "ssw", "f_stat")
  }

  /** Mutual information between two categorical columns (nats) — the
    * single-number dependence score over [[contingencyLift]]'s
    * per-cell table: MI = Σ p(x,y)·ln(lift) with every ln a
    * DIFFERENCE of [[graft.functions.DetLn]] on exact integer
    * PRODUCTS (n_xy·n vs n_x·n_y, both < 2^53) and the fold running
    * over (x, y)-sorted cells on the driver — bounded by the
    * categorical vocabulary product, never rows (quantize
    * high-cardinality columns first; same note as contingencyLift).
    * Output: one row (n, n_cells, mi_nats).
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String)
      : DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n_xy"))
      .orderBy(col("x"), col("y"))
      .collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
    require(cells.nonEmpty, "mutualInfo: empty input")
    val nx = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ny = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val n = cells.iterator.map(_._3).sum
    var mi = 0.0
    cells.foreach { case (x, y, nxy) =>
      val lnj = graft.functions.DetLnImpl.eval(nxy * n)
      val lnm = graft.functions.DetLnImpl.eval(nx(x) * ny(y))
      mi += (nxy.toDouble / n.toDouble) * (lnj - lnm)
    }
    df.sparkSession
      .createDataFrame(Seq((n, cells.length.toLong, mi)))
      .toDF("n", "n_cells", "mi_nats")
  }

  /** Per-entity Shannon entropy of a categorical mix (nats) — the
    * behavioral-diversity feature ("does this user do one thing or
    * many") and the class-balance audit in one operator:
    * H = −Σ (c/n)·ln(c/n), with every ln(c/n) the DIFFERENCE of
    * [[graft.functions.DetLn]] on the exact integer count and total
    * — bit-identical cross-engine — and the per-entity fold running
    * over the category-sorted list (ordered, bounded by the category
    * vocabulary). Fully distributed: two hash aggregates and a
    * per-row higher-order fold, windows nowhere. Output:
    * (entity, n_events, n_types, entropy).
    */
  def mixEntropy(df: DataFrame, entityCol: String, catCol: String)
      : DataFrame = {
    import graft.functions.GraftFunctions.detLn
    df.groupBy(col(entityCol).as("__e"), col(catCol).as("__t"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("__e"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_types"),
        sort_array(collect_list(struct(col("__t").as("t"),
          col("c").as("c")))).as("cs"))
      .select(col("__e").as(entityCol), col("n").as("n_events"),
        col("n_types"),
        (-aggregate(col("cs"), lit(0.0), (acc, x) =>
          acc + (x.getField("c").cast(DoubleType) /
            col("n").cast(DoubleType)) *
            (detLn(x.getField("c")) - detLn(col("n")))))
          .as("entropy"))
  }

  /** Overdispersion (Fano factor) audit — per group, is the
    * per-entity count distribution Poisson-like (var ≈ mean) or
    * clumped (var ≫ mean, the burst/bot signature)? Exact DECIMAL
    * moments of the per-entity counts (the welch envelope), then the
    * written-down mean = s/n, var = (n·q − s²)/(n·(n−1)), fano =
    * var/mean. Entities with zero events in a group are absent by
    * construction — dispersion over ACTIVE entities, documented.
    * Output: (group, n_entities, mean_c, var_c, fano).
    */
  def overdispersion(df: DataFrame, groupCol: String,
                     entityCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    df.groupBy(col(groupCol).as("__g"), col(entityCol).as("__u"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).as("s"),
        sum(col("c").cast(dec) * col("c")).as("q"))
      .where(col("n") > 1L && col("s") > 0)
      .withColumn("mean_c",
        col("s").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("var_c",
        (col("n").cast(dec) * col("q") - col("s") * col("s"))
          .cast(DoubleType) /
        (col("n").cast(dec) * (col("n") - 1L)).cast(DoubleType))
      .select(col("__g").as(groupCol), col("n").as("n_entities"),
        col("mean_c"), col("var_c"),
        (col("var_c") / col("mean_c")).as("fano"))
  }

  /** Empirical-Bayes rate smoothing — the CTR/conversion shrinkage
    * every ranking feature pipeline applies before a per-entity rate
    * is usable (public: additive smoothing toward the pooled prior;
    * the fixed-strength form of beta-binomial EB): shrunk =
    * (k + τ·p̄)/(n + τ) with p̄ = ΣK/ΣN the pooled rate and τ the
    * documented prior strength — entities with little data collapse
    * to the prior, heavy entities keep their own rate. Exactness:
    * counts exact, p̄ ONE division, each row's smoothed rate the
    * written-down multiply/add/divide of identical operands —
    * bit-stable with no fold anywhere. The pooled total rides the
    * single-bucket broadcast idiom. Output per entity:
    * (entity, n, k, raw_rate, smoothed).
    */
  def ebSmooth(df: DataFrame, entityCol: String, isConv: Column,
               tau: Long = 20L): DataFrame = {
    val perU = df
      .select(col(entityCol).as("__e"),
        when(isConv, 1L).otherwise(0L).as("__k"))
      .groupBy(col("__e"))
      .agg(count(lit(1)).as("n"), sum(col("__k")).as("k"))
    val tot = perU.agg(sum(col("n")).as("nn"), sum(col("k")).as("kk"))
      .withColumn("__jk", pmod(xxhash64(col("nn")), lit(1L)))
    perU.withColumn("__jk", pmod(xxhash64(col("n")), lit(1L)))
      .join(broadcast(tot), Seq("__jk"))
      .select(col("__e").as(entityCol), col("n"), col("k"),
        (col("k").cast(DoubleType) / col("n").cast(DoubleType))
          .as("raw_rate"),
        ((col("k").cast(DoubleType) + lit(tau.toDouble) *
          (col("kk").cast(DoubleType) / col("nn").cast(DoubleType)))
          / (col("n") + lit(tau)).cast(DoubleType)).as("smoothed"))
  }

  /** SPRT decision ledger — Wald's sequential probability ratio test
    * (public: Wald 1945), the "can we stop the experiment yet"
    * machinery read daily: against H0: rate = 1/20 vs H1: rate =
    * 3/50 at α = β = 0.05, the cumulative log-likelihood ratio
    * LLR_d = s_d·ln(p1/p0) + f_d·ln(q1/q0) crosses ln 19 → accept
    * H1, −ln 19 → accept H0, else continue. Both ln constants are
    * DIFFERENCES of [[graft.functions.DetLnImpl]] on small integers
    * (ln(6/5) = DetLn 6 − DetLn 5; ln(94/95) likewise), so every
    * LLR is two multiplies + one add of bit-identical constants and
    * the verdict comparisons agree cross-engine exactly. Cumulative
    * counts run over the DAY domain (calendar-bounded unpartitioned
    * window, allowlisted). Output per day:
    * (day, conv, fail, llr, verdict).
    */
  def sprtLedger(df: DataFrame, dayCol: Column, isConv: Column)
      : DataFrame = {
    val c1 = graft.functions.DetLnImpl.eval(6L) -
      graft.functions.DetLnImpl.eval(5L)
    val c2 = graft.functions.DetLnImpl.eval(94L) -
      graft.functions.DetLnImpl.eval(95L)
    val lnA = graft.functions.DetLnImpl.eval(19L)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("day"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    df.select(dayCol.as("day"),
        when(isConv, 1L).otherwise(0L).as("__c"))
      .groupBy(col("day"))
      .agg(sum(col("__c")).as("dc"),
        (count(lit(1)) - sum(col("__c"))).as("df"))
      .withColumn("conv", sum(col("dc")).over(w))
      .withColumn("fail", sum(col("df")).over(w))
      .withColumn("llr",
        col("conv").cast(DoubleType) * lit(c1) +
          col("fail").cast(DoubleType) * lit(c2))
      .select(col("day"), col("conv"), col("fail"), col("llr"),
        when(col("llr") >= lit(lnA), lit("accept_h1"))
          .when(col("llr") <= lit(-lnA), lit("accept_h0"))
          .otherwise(lit("continue")).as("verdict"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the canonical
    * nonparametric "did the distribution move" test beside
    * drift_chi2's categorical form: D = max_v |F_A(v) − F_B(v)|,
    * computed EXACTLY as max |cumA·n_B − cumB·n_A| over the
    * whole-dollar VALUE DOMAIN (the gini/rank_auc discipline: one
    * hash aggregate collapses rows to value groups, the cumulative
    * window runs over dollar cardinality, never row count — the
    * unpartitioned frame is bounded and allowlisted). Every quantity
    * is an exact BIGINT; D is ONE division d_num/(n_A·n_B). Dollar
    * grouping makes D the KS statistic of the dollar-quantized
    * distributions — the drift question actually asked at scale.
    * Output: one row (n_a, n_b, d_num, d_stat).
    */
  def ksTest(df: DataFrame, isA: Column, valueCents: Column)
      : DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("v"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    df.select(isA.as("__a"), valueCents.as("__c"))
      // floor, not div — mirrored by an explicit floor() in the
      // oracle (DuckDB's `//` truncates toward zero): a negative cent
      // value must land in the same dollar group cross-engine (the
      // gini_spend discipline)
      .select(col("__a"),
        expr("CAST(floor(__c / 100) AS BIGINT)").as("v"))
      .groupBy(col("v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("cb"))
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .select(col("na"), col("nb"),
        abs(col("cuma") * col("nb") - col("cumb") * col("na"))
          .as("dn"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("dn")).as("d_num"))
      .where(col("n_a") > 0L && col("n_b") > 0L)
      .select(col("n_a"), col("n_b"), col("d_num"),
        (col("d_num").cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType)).as("d_stat"))
  }

  /** Binary precision/recall/F1 — the confusion summary every
    * classifier card leads with: exact tp/fp/fn/tn counts, precision
    * and recall ONE division each, F1 the written-down
    * 2·(p·r)/(p + r); zero denominators emit 0.0 (documented).
    * One aggregate pass. Output:
    * (n, tp, fp, fn, tn, precision, recall, f1).
    */
  def binaryPrf(df: DataFrame, pred: Column, truth: Column)
      : DataFrame = {
    val w = df.select(pred.as("p"), truth.as("t"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("p") && col("t"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("p") && !col("t"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("p") && col("t"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("p") && !col("t"), 1L).otherwise(0L)).as("tn"))
    w.withColumn("precision",
        when(col("tp") + col("fp") > 0L,
          col("tp").cast(DoubleType) /
            (col("tp") + col("fp")).cast(DoubleType))
          .otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0L,
          col("tp").cast(DoubleType) /
            (col("tp") + col("fn")).cast(DoubleType))
          .otherwise(lit(0.0)))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * (col("precision") * col("recall")) /
            (col("precision") + col("recall")))
          .otherwise(lit(0.0)))
      .select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
        col("precision"), col("recall"), col("f1"))
  }

  /** Classifier agreement — Cohen's kappa (public: Cohen 1960) and
    * McNemar's paired test (public: McNemar 1947) in one row: kappa
    * measures agreement BEYOND CHANCE between two binary raters
    * (kappa = (pₒ − pₑ)/(1 − pₑ), rearranged to the exact-integer
    * (D·n − P)/(n² − P) with P the chance-agreement cross products),
    * and McNemar asks whether the two raters' ERROR RATES against
    * the truth differ, using only the disagreement counts:
    * χ² = (b − c)²/(b + c). Both are exact DECIMAL arithmetic until
    * ONE division each; degenerate denominators (constant raters /
    * no disagreements) emit 0.0, documented. One aggregate pass.
    * Output: (n, n_agree, kappa, b, c, mcnemar_chi2).
    */
  def classifierAgreement(df: DataFrame, r1: Column, r2: Column,
                          truth: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = df.select(r1.as("a"), r2.as("b"), truth.as("t"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"),
        sum(when((col("a") === col("t")) && (col("b") =!= col("t")),
          1L).otherwise(0L)).as("bb"),
        sum(when((col("a") =!= col("t")) && (col("b") === col("t")),
          1L).otherwise(0L)).as("cc"))
    val p = (col("n11") + col("n10")).cast(dec) *
      (col("n11") + col("n01")) +
      (col("n01") + col("n00")).cast(dec) * (col("n10") + col("n00"))
    val n2 = col("n").cast(dec) * col("n")
    w.withColumn("kappa",
        when(n2 - p > 0,
          ((col("n11") + col("n00")).cast(dec) * col("n") - p)
            .cast(DoubleType) / (n2 - p).cast(DoubleType))
          .otherwise(lit(0.0)))
      .withColumn("mcnemar_chi2",
        when(col("bb") + col("cc") > 0L,
          ((col("bb") - col("cc")).cast(dec) *
            (col("bb") - col("cc"))).cast(DoubleType) /
            (col("bb") + col("cc")).cast(DoubleType))
          .otherwise(lit(0.0)))
      .select(col("n"), (col("n11") + col("n00")).as("n_agree"),
        col("kappa"), col("bb").as("b"), col("cc").as("c"),
        col("mcnemar_chi2"))
  }

  /** Median with a distribution-free confidence interval — the
    * order-statistic CI (public: the binomial/sign-test interval,
    * normal-approximated ranks): for n observations the 95% CI for
    * the median is [x₍ℓ₎, x₍n−ℓ+1₎] with
    * ℓ = max(1, ⌊(n − z·√n)/2⌋), z = 1.959963984540054 — no
    * distributional assumption on the values, only on the ranks.
    * Everything is rank SELECTION over the per-group value census
    * (exact integers; the one float excursion is the written-down
    * ℓ arithmetic — one sqrt, one multiply, one subtract, one
    * halving, floor — identical cross-engine); windows partition by
    * group over value-domain rows. Output per group:
    * (group, n, median, ci_lo, ci_hi), cents.
    */
  def medianCi(df: DataFrame, groupCol: String, valueCents: Column)
      : DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.partitionBy(col("g"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    df.select(col(groupCol).as("g"), valueCents.as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("lo_rank", greatest(lit(1L),
        floor((col("n").cast(DoubleType) -
          lit(1.959963984540054) * sqrt(col("n").cast(DoubleType)))
          / lit(2.0)).cast(LongType)))
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("v")))
          .as("median"),
        min(when(col("cum") >= col("lo_rank"), col("v"))).as("ci_lo"),
        min(when(col("cum") >= expr("n - lo_rank + 1"), col("v")))
          .as("ci_hi"))
      .select(col("g").as(groupCol), col("n"), col("median"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Kendall tau-b rank stability — "did the leaderboard reshuffle":
    * concordance of the top-`topK` entities' counts between two
    * periods (public: Kendall 1938; tau-b handles ties). The
    * data-sized work is two count aggregates + one TakeOrdered
    * top-k; the O(topK²) pair census runs on the driver over the
    * bounded top list (the zipf envelope). Everything is exact
    * integer counting (concordant/discordant/tied pairs) until the
    * one written-down tau = (C−D)/√((n0−t1)·(n0−t2)) — a product of
    * exact-integer doubles under one sqrt, one division. Output:
    * one row (n_items, n_pairs, concordant, discordant, tau_b).
    */
  def rankStability(df: DataFrame, entityCol: String,
                    isFirst: Column, topK: Int = 100): DataFrame = {
    val base = df.select(col(entityCol).as("e"), isFirst.as("h1"))
    val top = base.where(col("h1")).groupBy(col("e"))
      .agg(count(lit(1)).as("c1"))
      .orderBy(col("c1").desc, col("e").asc).limit(topK)
    val rows = top
      .join(base.where(!col("h1")).groupBy(col("e"))
        .agg(count(lit(1)).as("c2")), Seq("e"), "left_outer")
      .select(col("e"), col("c1"), coalesce(col("c2"), lit(0L)))
      .orderBy(col("c1").desc, col("e").asc)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = rows.length
    require(n > 1, "rankStability: need at least two entities")
    var conc = 0L; var disc = 0L; var t1 = 0L; var t2 = 0L
    for (i <- 0 until n; j <- (i + 1) until n) {
      val dx = java.lang.Long.compare(rows(i)._1, rows(j)._1)
      val dy = java.lang.Long.compare(rows(i)._2, rows(j)._2)
      if (dx == 0 && dy == 0) { t1 += 1; t2 += 1 }
      else if (dx == 0) t1 += 1
      else if (dy == 0) t2 += 1
      else if (dx * dy > 0) conc += 1
      else disc += 1
    }
    val n0 = n.toLong * (n - 1L) / 2L
    val tau = (conc - disc).toDouble /
      math.sqrt((n0 - t1).toDouble * (n0 - t2).toDouble)
    df.sparkSession
      .createDataFrame(Seq((n.toLong, n0, conc, disc, tau)))
      .toDF("n_items", "n_pairs", "concordant", "discordant", "tau_b")
  }

  /** Two-proportion z² test — the conversion-rate sibling of
    * [[welchTTest]]'s mean contrast (the standard pooled two-sample
    * test for proportions): with k hits of n per arm,
    * z² = (k₁n₂ − k₂n₁)²·(n₁+n₂) / (n₁n₂·(k₁+k₂)·(n₁+n₂−k₁−k₂)) —
    * algebraically identical to the classic z with the pooled
    * variance, rearranged so EVERYTHING is an exact integer
    * (DECIMAL(38,0) products) until ONE final division; z² ≥ 3.84 is
    * the familiar two-sided 5% line. Output: one row
    * (n_a, n_b, k_a, k_b, rate_a, rate_b, z2).
    */
  def twoProportionZ(df: DataFrame, armCol: Column, isConv: Column)
      : DataFrame = {
    val dec = DecimalType(38, 0)
    val w = df.select(armCol.cast(LongType).as("arm"),
        when(isConv, 1L).otherwise(0L).as("c"))
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0L, col("c")).otherwise(0L)).as("k_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1L, col("c")).otherwise(0L)).as("k_b"))
      .where(col("n_a") > 0L && col("n_b") > 0L &&
        col("k_a") + col("k_b") > 0L &&
        col("n_a") + col("n_b") > col("k_a") + col("k_b"))
    val num = (col("k_a").cast(dec) * col("n_b") -
      col("k_b").cast(dec) * col("n_a"))
    val den = col("n_a").cast(dec) * col("n_b") *
      (col("k_a") + col("k_b")) *
      (col("n_a") + col("n_b") - col("k_a") - col("k_b"))
    w.select(col("n_a"), col("n_b"), col("k_a"), col("k_b"),
      (col("k_a").cast(DoubleType) / col("n_a").cast(DoubleType))
        .as("rate_a"),
      (col("k_b").cast(DoubleType) / col("n_b").cast(DoubleType))
        .as("rate_b"),
      ((num * num * (col("n_a") + col("n_b"))).cast(DoubleType) /
        den.cast(DoubleType)).as("z2"))
  }

  /** Quantile treatment effects — where in the distribution the arms
    * differ (public: the QTE read of an experiment; Doksum 1974):
    * the mean can hide a lift that lives only in the tail, so report
    * the ARM DIFFERENCE OF EXACT QUANTILES at p50/p90/p99. Exact
    * rank selection over the per-arm cents value-group census —
    * target rank ⌈q·n⌉ as integers, answer = the first value whose
    * per-arm cumulative count reaches it; every output is an exact
    * BIGINT (selected elements and their differences — no floats at
    * all). The cumulative window PARTITIONS BY ARM over value
    * groups — bounded by the value domain per arm, never rows.
    * Output: one row
    * (n_a, n_b, p50_a, p50_b, qte50, p90_a, p90_b, qte90,
    *  p99_a, p99_b, qte99), cents.
    */
  def quantileTreatment(df: DataFrame, isA: Column,
                        valueCents: Column): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("a")).orderBy(col("v"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.partitionBy(col("a"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    def sel(num: Long, den: Long): Column =
      min(when(col("cum") >=
        expr(s"(n * ${num}L + ${den - 1}L) div ${den}L"), col("v")))
    val perArm = df.select(isA.as("a"), valueCents.as("v"))
      .groupBy(col("a"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("a"))
      .agg(max(col("n")).as("n"), sel(1L, 2L).as("p50"),
        sel(9L, 10L).as("p90"), sel(99L, 100L).as("p99"))
    perArm.agg(
        max(when(col("a"), col("n"))).as("n_a"),
        max(when(!col("a"), col("n"))).as("n_b"),
        max(when(col("a"), col("p50"))).as("p50_a"),
        max(when(!col("a"), col("p50"))).as("p50_b"),
        max(when(col("a"), col("p90"))).as("p90_a"),
        max(when(!col("a"), col("p90"))).as("p90_b"),
        max(when(col("a"), col("p99"))).as("p99_a"),
        max(when(!col("a"), col("p99"))).as("p99_b"))
      .where(col("n_a").isNotNull && col("n_b").isNotNull)
      .select(col("n_a"), col("n_b"),
        col("p50_a"), col("p50_b"),
        (col("p50_b") - col("p50_a")).as("qte50"),
        col("p90_a"), col("p90_b"),
        (col("p90_b") - col("p90_a")).as("qte90"),
        col("p99_a"), col("p99_b"),
        (col("p99_b") - col("p99_a")).as("qte99"))
  }

  /** Population stability index — the industry drift score between a
    * REFERENCE and a CURRENT value distribution (public: standard
    * credit-scoring PSI): Σ_bins (p − q)·ln(p/q) over `nBins`
    * equi-width bins of the GLOBAL value range, Laplace-smoothed
    * (+1 per present bin) so empty-side bins stay finite. Rule of
    * thumb: < 0.1 stable, > 0.25 action.
    *
    * Determinism: counts and the global min/max are exact integers;
    * p − q is a subtract of single divisions, and ln(p/q) =
    * DetLn((c_ref+1)·(N_cur+B)) − DetLn((c_cur+1)·(N_ref+B)) — the
    * libm-free series on exact integer PRODUCTS (< 2^53), so every
    * term is bit-identical cross-engine; terms fold in bin order on
    * the driver over the ≤ nBins collected rows (the isotonic
    * envelope). Output: one row (n_bins, n_ref, n_cur, psi).
    */
  def psiDrift(df: DataFrame, isRef: Column, valueCents: Column,
               nBins: Int = 10): DataFrame = {
    val rows = df.select(isRef.as("__r"), valueCents.as("__c"))
    val head = rows.agg(min(col("__c")), max(col("__c"))).head
    val (lo, width) =
      if (head.isNullAt(0)) (0L, 1L)
      else (head.getLong(0), head.getLong(1) - head.getLong(0) + 1L)
    val bins = rows
      .select(expr(s"((__c - ${lo}L) * ${nBins}L) div ${width}L")
        .as("bin"), col("__r"))
      .groupBy(col("bin"))
      .agg(sum(when(col("__r"), 1L).otherwise(0L)).as("cr"),
        sum(when(!col("__r"), 1L).otherwise(0L)).as("cc"))
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    require(bins.nonEmpty, "psiDrift: empty input")
    val b = bins.length.toLong
    val nr = bins.iterator.map(_._1).sum
    val nc = bins.iterator.map(_._2).sum
    var psi = 0.0
    bins.foreach { case (cr, cc) =>
      val p = (cr + 1L).toDouble / (nr + b).toDouble
      val q = (cc + 1L).toDouble / (nc + b).toDouble
      val lnp = graft.functions.DetLnImpl.eval((cr + 1L) * (nc + b))
      val lnq = graft.functions.DetLnImpl.eval((cc + 1L) * (nr + b))
      psi += (p - q) * (lnp - lnq)
    }
    df.sparkSession
      .createDataFrame(Seq((b, nr, nc, psi)))
      .toDF("n_bins", "n_ref", "n_cur", "psi")
  }

  /** Nelson–Aalen cumulative hazard — the survival trio's third
    * member beside [[kaplanMeier]]'s survivor function and
    * [[logRank]]'s test (public: Nelson 1972, Aalen 1978):
    * H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ, the hazard mass accumulated so far —
    * preferred over −ln(KM) at small risk sets and the quantity
    * hazard-ratio models calibrate against. Same execution shape as
    * kaplanMeier: one duration-domain-bounded census, risk sets by
    * cumulative subtraction, the sum folded on the driver in
    * ascending-t order (one division per event time), replayed by
    * the oracle's ordered prefix list_reduce. Output: one row per
    * event time (t, n_risk, n_events, cumhaz).
    */
  def nelsonAalen(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val census = df
      .select(col(durationCol).cast(LongType).as("t"),
        col(eventCol).cast(BooleanType).as("e"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("e"), 1L).otherwise(0L)).as("d"))
      .orderBy(col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var atRisk = census.iterator.map(_._2).sum
    var h = 0.0
    val out = Seq.newBuilder[(Long, Long, Long, Double)]
    census.foreach { case (t, nAt, d) =>
      if (d > 0) {
        h = h + d.toDouble / atRisk.toDouble
        out += ((t, atRisk, d, h))
      }
      atRisk -= nAt
    }
    df.sparkSession.createDataFrame(out.result())
      .toDF("t", "n_risk", "n_events", "cumhaz")
  }

  /** Log-rank test — [[kaplanMeier]]'s hypothesis-test companion
    * (public: Mantel 1966): do two arms share a survival curve? At
    * each event time t with dₜ events over nₜ at risk (n1ₜ of them in
    * arm A, o1ₜ of the events in A): E1 += dₜ·n1ₜ/nₜ and
    * V += (dₜ·n1ₜ/nₜ)·((nₜ−n1ₜ)/nₜ)·((nₜ−dₜ)/(nₜ−1)); the statistic
    * (O1−E1)²/V is χ²₁-distributed under the null. Same execution
    * shape as kaplanMeier: one per-(t, arm) census bounded by the
    * duration domain, risk sets by cumulative subtraction, the two
    * sums folded on the driver in ascending-t order with one
    * written-down per-term IEEE op order — the oracle replays both
    * folds via ordered list_reduce. Output: one row
    * (o1, e1, var_lr, chi2).
    */
  def logRank(df: DataFrame, isArmA: Column, durationCol: String,
              eventCol: String): DataFrame = {
    val census = df
      .select(col(durationCol).cast(LongType).as("t"),
        col(eventCol).cast(BooleanType).as("e"),
        isArmA.cast(BooleanType).as("a"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("a"), 1L).otherwise(0L)).as("n_at_a"),
        sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        sum(when(col("e") && col("a"), 1L).otherwise(0L)).as("o1"))
      .orderBy(col("t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    var n = census.iterator.map(_._2).sum
    var n1 = census.iterator.map(_._3).sum
    var o1 = 0L
    var e1 = 0.0
    var v = 0.0
    census.foreach { case (_, nAt, nAtA, d, o1t) =>
      if (d > 0) {
        o1 += o1t
        e1 = e1 + (d * n1).toDouble / n.toDouble
        if (n > 1)
          v = v + ((d * n1).toDouble / n.toDouble) *
            ((n - n1).toDouble / n.toDouble) *
            ((n - d).toDouble / (n - 1).toDouble)
      }
      n -= nAt
      n1 -= nAtA
    }
    val chi2 = if (v > 0.0)
      ((o1.toDouble - e1) * (o1.toDouble - e1)) / v else 0.0
    df.sparkSession
      .createDataFrame(Seq((o1, e1, v, chi2)))
      .toDF("o1", "e1", "var_lr", "chi2")
  }

  /** CUPED variance reduction (public: Deng/Xu/Kohavi/Walker, WSDM
    * 2013) — the adjustment every mature A/B platform applies before
    * reading a lift: shrink the in-period metric Y by its pre-period
    * covariate X, Ŷ = Y − θ·(X − mean(X)), θ = cov(X,Y)/var(X),
    * which removes the between-user variance X explains without
    * biasing the treatment contrast (X predates assignment).
    *
    * Exactness envelope (the [[welchTTest]] discipline): per-user
    * (x, y) cents are exact BIGINTs, every moment (Σx, Σy, Σx², Σxy,
    * per-arm splits) is an exact DECIMAL(38,0) sum, and each released
    * double is ONE division of exact integers — θ, the arm means, and
    * the centered-covariate terms dx_arm = (Σx_arm·n − Σx·n_arm) /
    * (n_arm·n) all have exact numerators/denominators. The only
    * compound float ops are the written-down adj = mean − θ·dx (one
    * multiply, one subtract) and lift = adj_b − adj_a, replayed
    * verbatim by the oracle.
    *
    * Shape: one per-user hash aggregate (the unit of analysis), one
    * single-row global fold — no window, no second corpus pass.
    * Output: one row (n_users, n_a, n_b, theta, mean_y_a, mean_y_b,
    * adj_a, adj_b, adj_lift).
    */
  def cuped(df: DataFrame, userCol: String, armCol: Column,
            isPre: Column, valueCents: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val perUser = df
      .select(col(userCol).as("__u"), armCol.cast(LongType).as("__arm"),
        isPre.as("__pre"), valueCents.as("__c"))
      .groupBy(col("__u"))
      .agg(max(col("__arm")).as("arm"),
        coalesce(sum(when(col("__pre"), col("__c"))), lit(0L)).as("x"),
        coalesce(sum(when(!col("__pre"), col("__c"))), lit(0L)).as("y"))
    val w = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("x").cast(dec) * col("y")).as("sxy"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0L, col("x")).otherwise(0L).cast(dec))
        .as("sx_a"),
      sum(when(col("arm") === 0L, col("y")).otherwise(0L).cast(dec))
        .as("sy_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1L, col("x")).otherwise(0L).cast(dec))
        .as("sx_b"),
      sum(when(col("arm") === 1L, col("y")).otherwise(0L).cast(dec))
        .as("sy_b"))
      .where(col("n_a") > 0L && col("n_b") > 0L &&
        col("n").cast(dec) * col("sxx") - col("sx") * col("sx") > 0)
    val theta =
      (col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
        .cast(DoubleType) /
      (col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
        .cast(DoubleType)
    def meanY(sy: String, na: String): Column =
      col(sy).cast(DoubleType) / col(na).cast(DoubleType)
    def dx(sxa: String, na: String): Column =
      (col(sxa) * col("n") - col("sx") * col(na)).cast(DoubleType) /
        (col(na).cast(dec) * col("n")).cast(DoubleType)
    w.withColumn("theta", theta)
      .withColumn("mean_y_a", meanY("sy_a", "n_a"))
      .withColumn("mean_y_b", meanY("sy_b", "n_b"))
      .withColumn("adj_a",
        col("mean_y_a") - col("theta") * dx("sx_a", "n_a"))
      .withColumn("adj_b",
        col("mean_y_b") - col("theta") * dx("sx_b", "n_b"))
      .select(col("n").as("n_users"), col("n_a"), col("n_b"),
        col("theta"), col("mean_y_a"), col("mean_y_b"),
        col("adj_a"), col("adj_b"),
        (col("adj_b") - col("adj_a")).as("adj_lift"))
  }

  /** Difference-in-differences — [[cuped]]'s quasi-experimental
    * sibling (public: Card & Krueger 1994 popularized the modern
    * form): when assignment is not randomized, the treatment effect
    * estimate is the ARM difference of the pre→post CHANGES,
    * did = (post_b − pre_b) − (post_a − pre_a), which nets out both
    * the arms' level difference and the common time trend. Same
    * per-user census and exactness envelope as cuped: every mean is
    * ONE division of exact DECIMAL(38,0) integers, and the three
    * subtractions run in one written-down order. Output: one row
    * (n_a, n_b, pre_a, post_a, pre_b, post_b, did), means in cents.
    */
  def diffInDiff(df: DataFrame, userCol: String, armCol: Column,
                 isPre: Column, valueCents: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val perUser = df
      .select(col(userCol).as("__u"), armCol.cast(LongType).as("__arm"),
        isPre.as("__pre"), valueCents.as("__c"))
      .groupBy(col("__u"))
      .agg(max(col("__arm")).as("arm"),
        coalesce(sum(when(col("__pre"), col("__c"))), lit(0L)).as("x"),
        coalesce(sum(when(!col("__pre"), col("__c"))), lit(0L)).as("y"))
    def m(s: String, n: String): Column =
      col(s).cast(DoubleType) / col(n).cast(DoubleType)
    perUser.agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0L, col("x")).otherwise(0L).cast(dec))
          .as("sx_a"),
        sum(when(col("arm") === 0L, col("y")).otherwise(0L).cast(dec))
          .as("sy_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1L, col("x")).otherwise(0L).cast(dec))
          .as("sx_b"),
        sum(when(col("arm") === 1L, col("y")).otherwise(0L).cast(dec))
          .as("sy_b"))
      .where(col("n_a") > 0L && col("n_b") > 0L)
      .withColumn("pre_a", m("sx_a", "n_a"))
      .withColumn("post_a", m("sy_a", "n_a"))
      .withColumn("pre_b", m("sx_b", "n_b"))
      .withColumn("post_b", m("sy_b", "n_b"))
      .select(col("n_a"), col("n_b"),
        col("pre_a"), col("post_a"), col("pre_b"), col("post_b"),
        ((col("post_b") - col("pre_b")) - (col("post_a") - col("pre_a")))
          .as("did"))
  }

  /** Post-stratification lift — the causal-family member between
    * [[welchTTest]]'s raw contrast and [[cuped]]'s regression
    * adjustment (public: standardization / direct adjustment, the
    * survey-sampling estimator): bin users by the pre-period
    * covariate into `nBins` equi-width strata, take the arm contrast
    * WITHIN each stratum, and average the contrasts weighted by
    * stratum size — imbalance in who entered each arm rich or poor
    * cancels stratum by stratum. Strata missing either arm are
    * excluded from both the weights and the fold (documented
    * censoring; the estimator is undefined there).
    *
    * Exactness: per-stratum counts/sums are exact integers; each
    * per-stratum term is (n_s/n_tot)·(mean_b − mean_a) — three
    * single divisions, one subtract, one multiply — folded over
    * strata in ascending-bin order on the driver (≤ nBins rows, the
    * isotonic envelope), replayed by the oracle's ordered
    * list_reduce. Output: one row (n_strata, n_users, raw_lift,
    * strat_lift), cents.
    */
  def stratifiedLift(df: DataFrame, userCol: String, armCol: Column,
                     isPre: Column, valueCents: Column,
                     nBins: Int = 10): DataFrame = {
    val perUser = df
      .select(col(userCol).as("__u"), armCol.cast(LongType).as("__arm"),
        isPre.as("__pre"), valueCents.as("__c"))
      .groupBy(col("__u"))
      .agg(max(col("__arm")).as("arm"),
        coalesce(sum(when(col("__pre"), col("__c"))), lit(0L)).as("x"),
        coalesce(sum(when(!col("__pre"), col("__c"))), lit(0L)).as("y"))
    val head = perUser.agg(min(col("x")), max(col("x"))).head
    val (lo, width) =
      if (head.isNullAt(0)) (0L, 1L)
      else (head.getLong(0), head.getLong(1) - head.getLong(0) + 1L)
    val strata = perUser
      .select(expr(s"((x - ${lo}L) * ${nBins}L) div ${width}L")
        .as("bin"), col("arm"), col("y"))
      .groupBy(col("bin"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("sya"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1L, col("y")).otherwise(0L)).as("syb"))
      .where(col("na") > 0L && col("nb") > 0L)
      .orderBy(col("bin"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    require(strata.nonEmpty, "stratifiedLift: no two-arm stratum")
    val nTot = strata.iterator.map(s => s._1 + s._3).sum
    var acc = 0.0
    var naT = 0L; var nbT = 0L; var syaT = 0L; var sybT = 0L
    strata.foreach { case (na, sya, nb, syb) =>
      val ma = sya.toDouble / na.toDouble
      val mb = syb.toDouble / nb.toDouble
      val w = (na + nb).toDouble / nTot.toDouble
      acc += w * (mb - ma)
      naT += na; nbT += nb; syaT += sya; sybT += syb
    }
    val raw = sybT.toDouble / nbT.toDouble - syaT.toDouble / naT.toDouble
    df.sparkSession
      .createDataFrame(Seq((strata.length.toLong, nTot, raw, acc)))
      .toDF("n_strata", "n_users", "raw_lift", "strat_lift")
  }

  /** Markov next-event backtest — sequence-model evaluation over the
    * event log: fit the first-order transition argmax on the TRAIN
    * period's per-user consecutive bigrams, predict each EVAL-period
    * bigram's next type from its prev, and score exact hit counts.
    * The honest-baseline ritual before any sequence model ships: if
    * it can't beat the bigram argmax, it isn't learning sequence
    * structure. All counts exact integers, accuracy ONE division;
    * the argmax tie-break is written down (max count, then smallest
    * next type — a struct min over (−cnt, next), replayed by the
    * oracle's ordered row_number). Per-user windows only — nothing
    * unpartitioned. Eval bigrams whose prev never occurs in train
    * are dropped (no prediction exists), a documented censoring.
    * Output per (prev, predicted): n_eval, n_hits, acc.
    */
  def markovBacktest(events: DataFrame, userCol: String,
                     typeCol: String, tsCol: String, idCol: String,
                     isTrain: Column): DataFrame = {
    val base = events.select(col(userCol).as("__u"),
      col(typeCol).as("__t"), col(tsCol).as("__ts"),
      col(idCol).as("__id"), isTrain.as("__tr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u")).orderBy(col("__ts"), col("__id"))
    def bigrams(df: DataFrame): DataFrame = df
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .where(col("__next").isNotNull)
      .select(col("__t").as("prev"), col("__next").as("next"))
    val pred = bigrams(base.where(col("__tr")))
      .groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("prev"))
      .agg(min(struct((-col("cnt")).as("nc"), col("next").as("nx")))
        .getField("nx").as("predicted"))
    bigrams(base.where(!col("__tr")))
      .join(pred, Seq("prev"))
      .groupBy(col("prev"), col("predicted"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("next") === col("predicted"), 1L).otherwise(0L))
          .as("n_hits"))
      .select(col("prev"), col("predicted"), col("n_eval"),
        col("n_hits"),
        (col("n_hits").cast(DoubleType) / col("n_eval").cast(DoubleType))
          .as("acc"))
  }

  /** Two-feature OLS fit via exact normal equations — the linear
    * probe every feature pipeline runs ("does spend regress on
    * activity once frequency is controlled for?"), solved WITHOUT an
    * iterative optimizer: y = b0 + b1·x1 + b2·x2 where all inputs are
    * exact integers, every moment (Σx, Σx², Σxy, …) is an exact
    * DECIMAL(38,0) sum, the four Cramer determinants of the 3×3
    * normal system are exact integer polynomials in those moments,
    * and each coefficient is ONE double division det_i/det — the
    * [[welchTTest]] envelope, so the fit is bit-identical across
    * engines and shuffle layouts. One aggregate pass, one output row
    * (n, b0, b1, b2); rank-deficient designs (det = 0) emit nothing.
    * Scale note: the DECIMAL(38,0) envelope holds while
    * n·max(x)²·max(y) stays under 1e38 — quantize features first at
    * petabyte row counts (the same note as welchTTest).
    */
  def olsFit(df: DataFrame, yCol: Column, x1Col: Column,
             x2Col: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val m = df
      .select(yCol.cast(LongType).as("y"),
        x1Col.cast(LongType).as("x1"), x2Col.cast(LongType).as("x2"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1").cast(dec)).as("s1"),
        sum(col("x2").cast(dec)).as("s2"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x1").cast(dec) * col("x1")).as("s11"),
        sum(col("x1").cast(dec) * col("x2")).as("s12"),
        sum(col("x2").cast(dec) * col("x2")).as("s22"),
        sum(col("x1").cast(dec) * col("y")).as("s1y"),
        sum(col("x2").cast(dec) * col("y")).as("s2y"))
    val n = col("n").cast(dec)
    val det =
      n * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val det0 =
      col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 =
      n * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 =
      n * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    m.withColumn("__det", det)
      .withColumn("__d0", det0)
      .withColumn("__d1", det1)
      .withColumn("__d2", det2)
      .where(col("__det") =!= 0)
      .select(col("n"),
        (col("__d0").cast(DoubleType) / col("__det").cast(DoubleType))
          .as("b0"),
        (col("__d1").cast(DoubleType) / col("__det").cast(DoubleType))
          .as("b1"),
        (col("__d2").cast(DoubleType) / col("__det").cast(DoubleType))
          .as("b2"))
  }

  /** Split-conformal prediction interval (public: Vovk et al.;
    * Lei et al. 2018 popularized the split form) — distribution-free
    * uncertainty for ANY point model: fit on the TRAIN split, take
    * q̂ = the ⌈(n+1)(1−α)⌉-th smallest |residual| on the CALIBRATION
    * split, and ŷ ± q̂ then covers a fresh point with probability
    * ≥ 1−α, no normality assumed. Here the point model is
    * [[olsFit]]'s exact two-feature OLS and α = 0.1.
    *
    * Determinism: the coefficients are olsFit's bit-exact single
    * divisions (a bounded 1-row driver artifact); each residual is
    * the written-down (b0 + b1·x1) + b2·x2 then |y − ŷ|; q̂ is rank
    * SELECTION under the total order (residual, entity) — a
    * TakeOrdered limit-k, no global sort — and coverage on the TEST
    * split is an exact count ratio. Output: one row
    * (n_train, n_cal, n_test, q_hat, coverage) — the conformal
    * guarantee says coverage ≈ 0.9, which the row exhibits.
    */
  def conformalInterval(df: DataFrame, entityCol: String,
                        yCol: Column, x1Col: Column, x2Col: Column,
                        splitCol: Column): DataFrame = {
    val base = df.select(col(entityCol).as("id"), yCol.as("y"),
      x1Col.as("x1"), x2Col.as("x2"),
      splitCol.cast(LongType).as("sp"))
    val fit = olsFit(base.where(col("sp") === 0L), col("y"),
      col("x1"), col("x2")).head
    val (nTrain, b0, b1, b2) =
      (fit.getLong(0), fit.getDouble(1), fit.getDouble(2),
        fit.getDouble(3))
    def resid: Column = abs(col("y").cast(DoubleType) -
      ((lit(b0) + lit(b1) * col("x1").cast(DoubleType)) +
        lit(b2) * col("x2").cast(DoubleType)))
    val cal = base.where(col("sp") === 1L)
      .select(col("id"), resid.as("r"))
    val nCal = cal.count()
    val k = ((nCal + 1L) * 9L + 9L) / 10L
    // limit(k) is the TakeOrdered path and takes an Int — beyond
    // ~2e9 calibration rows, SUBSAMPLE the calibration split first
    // (conformal validity is per-point, a uniform subsample keeps
    // the guarantee); failing loudly beats silently mis-ranking
    require(k <= Int.MaxValue.toLong,
      "conformalInterval: calibration split too large for exact " +
        "rank selection — subsample it")
    val qhat = cal.orderBy(col("r"), col("id")).limit(k.toInt)
      .agg(max(col("r")).as("q_hat"))
      .withColumn("__jk", pmod(xxhash64(col("q_hat")), lit(1L)))
    base.where(col("sp") === 2L)
      .select(resid.as("r"))
      .withColumn("__jk", pmod(xxhash64(col("r")), lit(1L)))
      .join(broadcast(qhat), Seq("__jk"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("q_hat"), 1L).otherwise(0L))
          .as("n_cov"),
        max(col("q_hat")).as("q_hat"))
      .select(lit(nTrain).as("n_train"), lit(nCal).as("n_cal"),
        col("n_test"), col("q_hat"),
        (col("n_cov").cast(DoubleType) / col("n_test").cast(DoubleType))
          .as("coverage"))
  }

  /** UCB1 bandit policy scores (public: Auer/Cesa-Bianchi/Fischer
    * 2002) — the deterministic explore/exploit ledger a serving layer
    * reads per decision epoch: per arm, pulls n, exact mean reward,
    * and the optimism bonus √(2·ln N / n); the arm with the highest
    * ucb is the next pull. Computed OFFLINE over the event log (the
    * batch-policy-evaluation shape), so the scores are a ranking
    * artifact, not per-request state.
    *
    * Determinism: mean is one division of exact integers; ln runs on
    * the INTEGER total N through the [[graft.functions.DetLn]]
    * kernel — the libm-free series both engines replay step for step
    * at any N (Spark's log(), Math.log, and the oracle's ln() all
    * disagree in the last ulp on some integers, so no library ln can
    * feed a hash-compared double) — and
    * sqrt is correctly rounded by spec; the bonus/ucb op order is
    * written down and replayed by the oracle. The grand total joins
    * back through the single-bucket broadcast idiom
    * ([[contingencyLift]]) — arms, not rows, flow through it.
    * `scaleCents` states the reward scale R that maps the [0,1]-
    * reward theory to cents: ucb = mean + R·bonus.
    */
  def ucbPolicy(df: DataFrame, armCol: String, rewardCents: Column,
                scaleCents: Double = 10000.0): DataFrame = {
    val arms = df.select(col(armCol).as("arm"), rewardCents.as("__c"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("s"))
    val tot = arms.agg(sum(col("n")).as("n_total"))
      .withColumn("__jk", pmod(xxhash64(col("n_total")), lit(1L)))
    arms.withColumn("__jk", pmod(xxhash64(col("n")), lit(1L)))
      .join(broadcast(tot), Seq("__jk"))
      .withColumn("mean_cents",
        col("s").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("bonus",
        sqrt(graft.functions.GraftFunctions.detLn(col("n_total"))
          * lit(2.0) / col("n").cast(DoubleType)))
      .select(col("arm"), col("n"), col("n_total"), col("mean_cents"),
        col("bonus"),
        (col("mean_cents") + lit(scaleCents) * col("bonus")).as("ucb"))
  }

  /** Cramér's V — the [0,1]-normalized strength of association between
    * two categorical columns (public: Cramér 1946), the single-number
    * summary over [[contingencyLift]]'s cell table: V =
    * √(χ²/(n·min(r−1, c−1))). Answers "how strongly does feature X
    * determine label Y" on a scale comparable ACROSS feature pairs,
    * which raw χ² (unbounded in n and table size) cannot.
    *
    * Exactness: χ² is computed through the zero-cell-free identity
    * Σ(O−E)²/E = Σ_{observed} O²·n/(n_x·n_y) − n, so only OBSERVED
    * cells contribute and no row×col grid is materialized. Each term
    * is one multiply/divide chain over exact BIGINTs cast to double
    * in a written-down order, and the cross-cell sum folds
    * left-to-right over the (x, y)-sorted cell list (the km_logrank
    * ordered-fold discipline) — bit-identical to the oracle's
    * `list_reduce(list(term ORDER BY x, y))`.
    *
    * Shape: one hash aggregate to cells (vocabulary², never
    * row-bound), marginals re-aggregated from the cell frame and
    * broadcast back; the fold runs over one collected cell LIST in a
    * single-row aggregate — bounded by the category vocabularies.
    * O²·n stays below 2^63 up to ~3·10⁹ rows per cell; beyond that
    * swap the term to (O/n_x)·(O/n_y)·n in doubles (noted, not
    * needed at this fixture's scale).
    */
  def cramersV(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val cells = df.select(xCol.cast(StringType).as("x"),
        yCol.cast(LongType).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("o"))
    val nx = cells.groupBy(col("x")).agg(sum(col("o")).as("nx"))
    val ny = cells.groupBy(col("y")).agg(sum(col("o")).as("ny"))
    val rtot = nx.agg(sum(col("nx")).as("n"),
        count(lit(1)).as("r_levels"))
      .withColumn("__jk", pmod(xxhash64(col("n")), lit(1L)))
    val ctot = ny.agg(count(lit(1)).as("c_levels"))
      .withColumn("__jk", pmod(xxhash64(col("c_levels")), lit(1L)))
    val terms = cells.join(broadcast(nx), "x").join(broadcast(ny), "y")
      .withColumn("__jk", pmod(xxhash64(col("o")), lit(1L)))
      .join(broadcast(rtot), Seq("__jk"))
      .select(col("x"), col("y"), col("n"), col("r_levels"),
        ((col("o") * col("o")).cast(DoubleType)
          * col("n").cast(DoubleType)
          / (col("nx") * col("ny")).cast(DoubleType)).as("term"))
    terms
      .groupBy(col("n"), col("r_levels"))
      .agg(collect_list(struct(col("x"), col("y"), col("term")))
        .as("ts"))
      .select(col("n"), col("r_levels"),
        (aggregate(sort_array(col("ts")), lit(0.0),
          (acc, t) => acc + t.getField("term"))
          - col("n").cast(DoubleType)).as("chi2"))
      .withColumn("__jk", pmod(xxhash64(col("n")), lit(1L)))
      .join(broadcast(ctot), Seq("__jk"))
      // degenerate single-level inputs (min(r−1, c−1) = 0) would
      // divide by zero into NaN; drop the row LOUDLY-EMPTY instead —
      // V is undefined for a 1×c / r×1 table — mirrored in the oracle
      .where(col("r_levels") > 1L && col("c_levels") > 1L)
      .select(col("n"), col("r_levels"), col("c_levels"), col("chi2"),
        sqrt(col("chi2") /
          (col("n") * least(col("r_levels") - 1L, col("c_levels") - 1L))
            .cast(DoubleType)).as("v"))
  }

  /** Decile gain/lift table — the capture-curve companion of
    * [[rankAuc]] (one number) and calibrationBins (probability
    * quality): rank rows by a score descending, cut into `buckets`
    * equal-depth bins under the total (score DESC, id ASC) order, and
    * report per bin the positives captured, the cumulative capture
    * rate, and the lift over random — the "top-decile contains 4.2×
    * its share of positives" artifact every targeting/triage model
    * review starts from.
    *
    * Scale shape — NO global row sort: per-score-group offsets come
    * from a cumulative window over the bounded SCORE census (group
    * counts, vocabulary-bound), and within-group ranks from a window
    * PARTITIONED by score; global rank = offset + within-rank. The
    * bin id ((rank−1)·B) div n and every count are exact BIGINTs; the
    * only doubles are the two final divisions.
    */
  def cumulativeGain(df: DataFrame, idCol: String, scoreCol: Column,
                     isPos: Column, buckets: Int = 10): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol).as("id"),
      scoreCol.cast(LongType).as("s"),
      when(isPos, 1L).otherwise(0L).as("p"))
    val wOff = W.orderBy(col("s").desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val offs = rows.groupBy(col("s")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum_end", sum(col("cnt")).over(wOff))
      .select(col("s"), (col("cum_end") - col("cnt")).as("off"))
    val tot = rows.agg(count(lit(1)).as("n"), sum(col("p")).as("tot_pos"))
      .withColumn("__jk", pmod(xxhash64(col("n")), lit(1L)))
    val wIn = W.partitionBy(col("s")).orderBy(col("id"))
    val wCum = W.orderBy(col("decile"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    rows.join(broadcast(offs), "s")
      .withColumn("rank", col("off") + row_number().over(wIn))
      .withColumn("__jk", pmod(xxhash64(col("p")), lit(1L)))
      .join(broadcast(tot), Seq("__jk"))
      .select(expr(s"((rank - 1L) * ${buckets}L) div n").as("decile"),
        col("p"), col("n"), col("tot_pos"))
      .groupBy(col("decile"), col("n"), col("tot_pos"))
      .agg(count(lit(1)).as("n_rows"), sum(col("p")).as("n_pos"))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .select(col("decile"), col("n_rows"), col("n_pos"), col("cum_pos"),
        (col("cum_pos").cast(DoubleType) / col("tot_pos").cast(DoubleType))
          .as("capture"),
        ((col("n_pos") * col("n")).cast(DoubleType) /
          (col("n_rows") * col("tot_pos")).cast(DoubleType)).as("lift"))
  }

  /** One-feature decision stump by exact weighted Gini — "train" the
    * simplest possible classifier entirely inside the engine: over a
    * bucketed value grid, pick the threshold t minimizing
    * n_L·Gini(L) + n_R·Gini(R) for the split value < t. The
    * feature-screening primitive (CART's inner loop, a GBDT's split
    * finder for one feature) and the honest baseline every fancier
    * model must beat.
    *
    * Exactness: with left counts (n_L, pos p_L, neg q_L) the weighted
    * impurity is (n_L² − p_L² − q_L²)/n_L + (n_R² − p_R² − q_R²)/n_R
    * over n — every numerator an exact BIGINT, each side ONE double
    * division, one add, one final division by n, all in a written-down
    * order. The argmin is pure comparison (min over (gini, t) structs,
    * threshold as tiebreak) — no summation across candidates.
    *
    * Shape: one hash aggregate to the bucket census (value-grid
    * bounded), one cumulative window over that census, one struct-min
    * aggregate. The rows never sort globally.
    */
  def decisionStump(df: DataFrame, valueCents: Column, isPos: Column,
                    bucketCents: Long = 500L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // floor bucketing (exact below 2^53, floor on BOTH engines — the
    // k_anonymity negative-value discipline)
    val census = df.select(
        floor(valueCents.cast(LongType) / lit(bucketCents))
          .cast(LongType).as("b"),
        when(isPos, 1L).otherwise(0L).as("p"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cnt"), sum(col("p")).as("np"))
    val wCum = W.orderBy(col("b"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val side = census
      .withColumn("nl", sum(col("cnt")).over(wCum))
      .withColumn("pl", sum(col("np")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("p", sum(col("np")).over(wAll))
      .where(col("nl") < col("n")) // rightmost edge splits nothing
      .select(((col("b") + 1L) * bucketCents).as("thr_cents"),
        col("nl"), col("pl"), (col("n") - col("nl")).as("nr"),
        (col("p") - col("pl")).as("pr"), col("n"))
      .withColumn("ql", col("nl") - col("pl"))
      .withColumn("qr", col("nr") - col("pr"))
      .withColumn("gini_w",
        ((col("nl") * col("nl") - col("pl") * col("pl")
          - col("ql") * col("ql")).cast(DoubleType)
          / col("nl").cast(DoubleType)
          + (col("nr") * col("nr") - col("pr") * col("pr")
            - col("qr") * col("qr")).cast(DoubleType)
            / col("nr").cast(DoubleType))
          / col("n").cast(DoubleType))
    side
      .agg(min(struct(col("gini_w"), col("thr_cents"), col("nl"),
        col("pl"), col("nr"), col("pr"))).as("s"))
      .select(col("s.thr_cents").as("thr_cents"),
        col("s.nl").as("n_left"), col("s.pl").as("pos_left"),
        col("s.nr").as("n_right"), col("s.pr").as("pos_right"),
        col("s.gini_w").as("gini_w"))
  }

  /** 1-D earth mover's distance between two value distributions over
    * a shared bucket grid — EMD(A,B) = Σ_b |F_A(b) − F_B(b)| with
    * unit-bucket width (public: the Wasserstein-1 closed form in one
    * dimension). The L1 drift distance beside ks_test's supremum and
    * psi_drift's log-ratio: KS sees the worst single point, EMD sees
    * the total mass that must MOVE — a fatter-tail shift with a small
    * max gap shows up here first.
    *
    * Exact: per-grid-point |cumA·n_B − cumB·n_A| is an exact BIGINT
    * (cross-multiplied CDFs, no per-bucket division), WEIGHTED by the
    * gap to the next occupied bucket — the CDF difference persists
    * across empty buckets, so the gap weight is what makes this the
    * true Wasserstein-1, not a support-compressed lookalike — and
    * summed as BIGINT; ONE final division by n_A·n_B. Cumulative
    * counts ride one window over the bucket CENSUS (value-grid
    * bounded — the gini_spend bound).
    */
  def emdDrift(a: DataFrame, b: DataFrame, valueCents: Column,
               bucketCents: Long = 500L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    def bucketed(df: DataFrame, cnt: String) = df
      .select(floor(valueCents.cast(LongType) / lit(bucketCents))
        .cast(LongType).as("bkt"))
      .groupBy(col("bkt")).agg(count(lit(1)).as(cnt))
    val grid = bucketed(a, "na").join(bucketed(b, "nb"),
        Seq("bkt"), "full_outer")
      .select(col("bkt"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val wc = W.orderBy(col("bkt"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    grid
      .withColumn("ca", sum(col("na")).over(wc))
      .withColumn("cb", sum(col("nb")).over(wc))
      .withColumn("ta", sum(col("na")).over(wAll))
      .withColumn("tb", sum(col("nb")).over(wAll))
      // gap to the next occupied bucket; the last grid point has
      // F_A = F_B = 1, so its weight never matters — pin it to 1
      .withColumn("gap",
        coalesce(lead(col("bkt"), 1).over(W.orderBy(col("bkt")))
          - col("bkt"), lit(1L)))
      .groupBy(col("ta"), col("tb"))
      .agg(sum(abs(col("ca") * col("tb") - col("cb") * col("ta"))
        * col("gap")).as("emd_num"))
      .where(col("ta") > 0L && col("tb") > 0L)
      .select(col("ta").as("n_a"), col("tb").as("n_b"), col("emd_num"),
        (col("emd_num").cast(DoubleType) /
          (col("ta") * col("tb")).cast(DoubleType)).as("emd_buckets"))
  }

  /** Restricted mean survival time — ∫₀^τ S(t)dt over the
    * [[kaplanMeier]] step curve (public: the standard
    * hazard-assumption-free effect summary when proportional hazards
    * fails): "average days-to-conversion credit within the first τ
    * days" — ONE number from the KM curve that, unlike the median,
    * always exists under heavy censoring. Day-grain durations: the
    * integral is the sum of the post-event survival levels over the
    * grid [0, τ), S right-continuous, events at t ≥ τ outside the
    * integration window by construction.
    *
    * Same exactness contract as kaplanMeier: the product and the
    * area fold run on the driver over the day-domain-bounded census
    * in ONE written-down IEEE order (ascending event days; area
    * accumulates ascending grid days), replayed by the oracle's
    * ordered list_reduce prefixes. Output: one row
    * (tau, n_users, surv_tau, rmst_days).
    */
  def rmst(df: DataFrame, durationCol: String, eventCol: String,
           tau: Long): DataFrame = {
    val census = df
      .select(col(durationCol).cast(LongType).as("t"),
        col(eventCol).cast(BooleanType).as("e"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("e"), 1L).otherwise(0L)).as("d"))
      .orderBy(col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = census.iterator.map(_._2).sum
    var atRisk = total
    var surv = 1.0
    val survAt = collection.mutable.Map.empty[Long, Double]
    census.foreach { case (t, nAt, d) =>
      if (d > 0 && t < tau) {
        surv = surv * (1.0 - d.toDouble / atRisk.toDouble)
        survAt(t) = surv
      }
      atRisk -= nAt
    }
    var area = 0.0
    var s = 1.0
    (0L until tau).foreach { k =>
      s = survAt.getOrElse(k, s)
      area += s
    }
    df.sparkSession
      .createDataFrame(Seq((tau, total, s, area)))
      .toDF("tau", "n_users", "surv_tau", "rmst_days")
  }

  /** Odds ratio with a Wald confidence interval over a 2×2 exposure ×
    * outcome table — the effect-size number (how many TIMES more
    * likely) that complements the two-proportion z's significance
    * verdict; the reporting convention of epidemiology and every
    * conversion-lift writeup. ln(OR) = ln(a·d) − ln(b·c) goes through
    * [[graft.functions.DetLn]] on exact integer PRODUCTS (the
    * psi_drift ratio-as-difference rule, bit-identical cross-engine);
    * the Wald se = √(1/a + 1/b + 1/c + 1/d) is four reciprocals of
    * exact counts summed left-to-right — written-down IEEE order, no
    * library ln or accumulation ambiguity anywhere. Cells with any
    * zero are filtered (the CI is undefined there; callers wanting
    * the Haldane +0.5 correction pre-smooth their counts).
    */
  def oddsRatio(df: DataFrame, isExposed: Column,
                isPos: Column): DataFrame = {
    import graft.functions.GraftFunctions.detLn
    df.agg(
        sum(when(isPos && isExposed, 1L).otherwise(0L)).as("a"),
        sum(when(isPos && !isExposed, 1L).otherwise(0L)).as("b"),
        sum(when(!isPos && isExposed, 1L).otherwise(0L)).as("c"),
        sum(when(!isPos && !isExposed, 1L).otherwise(0L)).as("d"))
      .where(col("a") > 0L && col("b") > 0L && col("c") > 0L &&
        col("d") > 0L)
      .withColumn("ln_or",
        detLn(col("a") * col("d")) - detLn(col("b") * col("c")))
      .withColumn("se", sqrt(
        lit(1.0) / col("a").cast(DoubleType)
          + lit(1.0) / col("b").cast(DoubleType)
          + lit(1.0) / col("c").cast(DoubleType)
          + lit(1.0) / col("d").cast(DoubleType)))
      .select(col("a"), col("b"), col("c"), col("d"), col("ln_or"),
        col("se"),
        (col("ln_or") - lit(1.959963984540054) * col("se")).as("lo"),
        (col("ln_or") + lit(1.959963984540054) * col("se")).as("hi"))
  }

  /** Tukey median polish (public: Tukey 1977, EDA ch. 10) of a two-way
    * table — the robust additive decomposition value ≈ overall +
    * row effect + column effect + residual, fit by alternately
    * sweeping out row and column MEDIANS instead of means: the
    * outlier-immune sibling of the two-way ANOVA decomposition, and
    * the standard way to read a type × day-of-week table ("is Friday
    * really higher, or is that one flash-sale cell?"). Residuals are
    * where the anomalies live.
    *
    * All integers end to end: cells are exact cent sums, every sweep
    * subtracts a LOWER MEDIAN (rank selection at (m+1) div 2 under
    * the written-down (value, key) order — comparisons only), so
    * effects and residuals stay exact BIGINTs and the oracle replays
    * each sweep as windowed rank selection. The table itself is
    * category-vocabulary-bounded (rows × cols cells), so the sweeps
    * run on the driver over the collected census — the theilSen rule.
    * Output: long-form rows (component ∈ overall/row/col/resid, r, c,
    * value).
    */
  def medianPolish(df: DataFrame, rowCol: Column, colCol: Column,
                   valueCents: Column, sweeps: Int = 2): DataFrame = {
    val cells = df.select(rowCol.cast(StringType).as("r"),
        colCol.cast(LongType).as("c"), valueCents.cast(LongType).as("v"))
      .groupBy(col("r"), col("c")).agg(sum(col("v")).as("v"))
      .collect().map(x => ((x.getString(0), x.getLong(1)), x.getLong(2)))
    require(cells.nonEmpty, "medianPolish: empty table")
    val rows = cells.map(_._1._1).distinct.sorted
    val cols = cells.map(_._1._2).distinct.sorted
    val resid = collection.mutable.Map(cells: _*)
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length + 1) / 2 - 1)
    }
    var overall = 0L
    val rowEff = collection.mutable.Map(rows.map(_ -> 0L): _*)
    val colEff = collection.mutable.Map(cols.map(_ -> 0L): _*)
    for (_ <- 1 to sweeps) {
      rows.foreach { r =>
        val obs = cols.flatMap(c => resid.get((r, c)))
        val m = lowerMedian(obs)
        rowEff(r) += m
        cols.foreach(c =>
          resid.get((r, c)).foreach(v => resid((r, c)) = v - m))
      }
      val rm = lowerMedian(rows.map(rowEff))
      overall += rm
      rows.foreach(r => rowEff(r) -= rm)
      cols.foreach { c =>
        val obs = rows.flatMap(r => resid.get((r, c)))
        val m = lowerMedian(obs)
        colEff(c) += m
        rows.foreach(r =>
          resid.get((r, c)).foreach(v => resid((r, c)) = v - m))
      }
      val cm = lowerMedian(cols.map(colEff))
      overall += cm
      cols.foreach(c => colEff(c) -= cm)
    }
    val out: Seq[(String, Option[String], Option[Long], Long)] =
      Seq(("overall", Option.empty[String], Option.empty[Long],
        overall)) ++
        rows.map(r => ("row", Some(r), Option.empty[Long], rowEff(r))) ++
        cols.map(c => ("col", Option.empty[String], Some(c),
          colEff(c))) ++
        cells.map { case ((r, c), _) =>
          ("resid", Some(r), Some(c), resid((r, c)))
        }
    df.sparkSession.createDataFrame(out)
      .toDF("component", "r", "c", "value")
  }
}
